"""Wav2Vec2 feature extractor (reference
src/transformers/models/wav2vec2/feature_extraction_wav2vec2.py): raw
waveform batching with optional per-utterance zero-mean/unit-variance
normalization computed over the NON-PADDED region."""

from __future__ import annotations

import numpy as np

from ...feature_extraction_utils import BatchFeature, SequenceFeatureExtractor


class Wav2Vec2FeatureExtractor(SequenceFeatureExtractor):
    model_input_names = ["input_values", "attention_mask"]

    def __init__(self, feature_size=1, sampling_rate=16000, padding_value=0.0,
                 do_normalize=True, return_attention_mask=False, **kwargs):
        super().__init__(feature_size=feature_size, sampling_rate=sampling_rate,
                         padding_value=padding_value, **kwargs)
        self.do_normalize = do_normalize
        self.return_attention_mask = return_attention_mask

    @staticmethod
    def zero_mean_unit_var_norm(values: list[np.ndarray], lengths: list[int]) -> list[np.ndarray]:
        out = []
        for v, n in zip(values, lengths):
            region = v[:n]
            norm = (region - region.mean()) / np.sqrt(region.var() + 1e-7)
            padded = np.concatenate([norm, np.zeros_like(v[n:])])
            out.append(padded.astype(np.float32))
        return out

    def __call__(self, raw_speech, padding=True, max_length=None,
                 return_tensors="np", sampling_rate=None, **kwargs) -> BatchFeature:
        if sampling_rate is not None and sampling_rate != self.sampling_rate:
            raise ValueError(
                f"Model expects {self.sampling_rate} Hz input, got {sampling_rate}")
        if isinstance(raw_speech, np.ndarray) and raw_speech.ndim == 1:
            raw_speech = [raw_speech]
        seqs = [np.asarray(s, np.float32) for s in raw_speech]
        lengths = [len(s) for s in seqs]
        target = max_length or max(lengths)
        padded = [np.pad(s, (0, target - len(s))) if len(s) < target else s[:target]
                  for s in seqs]
        if self.do_normalize:
            padded = self.zero_mean_unit_var_norm(padded, [min(n, target) for n in lengths])
        mask = np.stack([
            (np.arange(target) < n).astype(np.int64) for n in lengths])
        values = np.stack(padded)
        data = {"input_values": values}
        if self.return_attention_mask:
            data["attention_mask"] = mask
        if return_tensors == "jax":
            import jax.numpy as jnp

            data = {k: jnp.asarray(v) for k, v in data.items()}
        return BatchFeature(data)
