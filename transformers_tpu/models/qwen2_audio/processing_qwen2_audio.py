"""Qwen2-Audio processor (reference
models/qwen2_audio/processing_qwen2_audio.py): Whisper feature extractor +
tokenizer; each ``<|AUDIO|>`` expands to the encoder's output length for
that clip — ((mel_len - 1) // 2 + 1 - 2) // 2 + 1 — wrapped in
bos/eos audio markers when not already present."""

from __future__ import annotations

import numpy as np

from ...image_processing_utils import BatchFeature
from ...processing_utils import ProcessorMixin


class Qwen2AudioProcessor(ProcessorMixin):
    attributes = ["feature_extractor", "tokenizer"]

    def __init__(self, feature_extractor=None, tokenizer=None,
                 audio_token: str = "<|AUDIO|>",
                 audio_bos_token: str = "<|audio_bos|>",
                 audio_eos_token: str = "<|audio_eos|>", **kwargs):
        super().__init__(feature_extractor=feature_extractor, tokenizer=tokenizer,
                         **kwargs)
        self.audio_token = getattr(tokenizer, "audio_token", None) or audio_token
        self.audio_bos_token = audio_bos_token
        self.audio_eos_token = audio_eos_token

    def __call__(self, text=None, audio=None, audios=None, return_tensors="np",
                 padding=True, **kwargs) -> BatchFeature:
        audio = audio if audio is not None else audios
        data: dict = {}
        if isinstance(text, str):
            text = [text]
        if audio is not None:
            if isinstance(audio, np.ndarray) and audio.ndim == 1:
                audio = [audio]
            out = self.feature_extractor(audio, return_tensors="np", **kwargs)
            if "attention_mask" in out:
                out["feature_attention_mask"] = out.pop("attention_mask")
            else:
                # Whisper tier without return_attention_mask: live frames =
                # ceil(samples / hop) capped at the padded frame count
                hop = getattr(self.feature_extractor, "hop_length", 160)
                total = np.asarray(out["input_features"]).shape[-1]
                mask = np.zeros((len(audio), total), np.int64)
                for i, a in enumerate(audio):
                    n = min(total, int(np.ceil(len(np.asarray(a)) / hop)))
                    mask[i, :n] = 1
                out["feature_attention_mask"] = mask
            data.update(out)
            if text is not None:
                mel_lens = (np.asarray(data["feature_attention_mask"]).sum(-1)
                            .tolist())
                expanded = []
                for sample in text:
                    while self.audio_token in sample:
                        mel_len = mel_lens.pop(0)
                        input_length = (mel_len - 1) // 2 + 1
                        n = (input_length - 2) // 2 + 1
                        rep = self.audio_token * n
                        at = sample.find(self.audio_token)
                        end = at + len(self.audio_token)
                        has_bos = sample[max(0, at - len(self.audio_bos_token)):at] \
                            == self.audio_bos_token
                        has_eos = sample[end:end + len(self.audio_eos_token)] \
                            == self.audio_eos_token
                        if not has_bos and not has_eos:
                            rep = self.audio_bos_token + rep + self.audio_eos_token
                        # placeholder swap so the loop terminates
                        sample = sample[:at] + rep.replace(
                            self.audio_token, "\x00") + sample[end:]
                    expanded.append(sample.replace("\x00", self.audio_token))
                text = expanded
        if text is not None:
            data.update(self.tokenizer(text, return_tensors=return_tensors,
                                       padding=padding,
                                       **{k: v for k, v in kwargs.items()
                                          if k in ("truncation", "max_length",
                                                   "add_special_tokens")}))
        if return_tensors == "jax":
            import jax.numpy as jnp

            data = {k: (jnp.asarray(v) if not isinstance(v, (list, tuple)) else v)
                    for k, v in data.items()}
        return BatchFeature(data)
