"""SpeechT5 processor (reference models/speecht5/processing_speecht5.py):
routes audio -> input_values, text -> input_ids, audio_target / text_target
-> labels (ASR, TTS, and voice-conversion directions)."""

from __future__ import annotations

from ...image_processing_utils import BatchFeature
from ...processing_utils import ProcessorMixin


class SpeechT5Processor(ProcessorMixin):
    attributes = ["feature_extractor", "tokenizer"]

    def __call__(self, audio=None, text=None, text_target=None,
                 audio_target=None, return_tensors="np", padding=True,
                 **kwargs) -> BatchFeature:
        data: dict = {}
        if audio is not None:
            data.update(self.feature_extractor(audio=audio,
                                               return_tensors=return_tensors,
                                               **kwargs))
        elif text is not None:
            data.update(self.tokenizer(text if not isinstance(text, str) else [text],
                                       return_tensors=return_tensors,
                                       padding=padding))
        if audio_target is not None:
            tgt = self.feature_extractor(audio_target=audio_target,
                                         return_tensors=return_tensors, **kwargs)
            data["labels"] = tgt.get("labels", tgt.get("input_values"))
            if "attention_mask" in tgt and "attention_mask" not in data:
                data["decoder_attention_mask"] = tgt["attention_mask"]
        elif text_target is not None:
            tgt = self.tokenizer(text_target if not isinstance(text_target, str)
                                 else [text_target],
                                 return_tensors=return_tensors, padding=padding)
            data["labels"] = tgt["input_ids"]
            data["decoder_attention_mask"] = tgt["attention_mask"]
        return BatchFeature(data)
