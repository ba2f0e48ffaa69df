"""MusicGen processor (reference models/musicgen/processing_musicgen.py):
T5 tokenizer for text conditioning + EnCodec feature extractor for audio
targets."""

from __future__ import annotations

from ...image_processing_utils import BatchFeature
from ...processing_utils import ProcessorMixin


class MusicgenProcessor(ProcessorMixin):
    attributes = ["feature_extractor", "tokenizer"]

    def __call__(self, text=None, audio=None, return_tensors="np",
                 padding=True, **kwargs) -> BatchFeature:
        data: dict = {}
        if text is not None:
            data.update(self.tokenizer(text if not isinstance(text, str) else [text],
                                       return_tensors=return_tensors, padding=padding))
        if audio is not None:
            out = self.feature_extractor(audio, return_tensors=return_tensors, **kwargs)
            data["input_values"] = out["input_values"]
            if "padding_mask" in out:
                data["padding_mask"] = out["padding_mask"]
        return BatchFeature(data)

    def batch_decode(self, *args, **kwargs):
        # audio values pass through; token sequences go to the tokenizer
        if args and hasattr(args[0], "ndim") and getattr(args[0], "ndim", 0) > 2:
            return list(args[0])
        return self.tokenizer.batch_decode(*args, **kwargs)
