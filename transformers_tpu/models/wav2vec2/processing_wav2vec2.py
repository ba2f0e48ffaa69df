"""Wav2Vec2 processor (reference models/wav2vec2/processing_wav2vec2.py):
feature extractor for audio + CTC tokenizer for targets/decoding."""

from __future__ import annotations

from ...image_processing_utils import BatchFeature
from ...processing_utils import ProcessorMixin


class Wav2Vec2Processor(ProcessorMixin):
    attributes = ["feature_extractor", "tokenizer"]

    def __call__(self, audio=None, text=None, **kwargs):
        out = super().__call__(text=text, audio=audio, **kwargs)
        if text is not None and audio is not None:
            out["labels"] = out.pop("input_ids")
        return BatchFeature(dict(out))
