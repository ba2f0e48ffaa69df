"""Speech2Text processor (reference
models/speech_to_text/processing_speech_to_text.py)."""

from __future__ import annotations

from ...image_processing_utils import BatchFeature
from ...processing_utils import ProcessorMixin


class Speech2TextProcessor(ProcessorMixin):
    attributes = ["feature_extractor", "tokenizer"]

    def __call__(self, audio=None, text=None, **kwargs):
        out = super().__call__(text=text, audio=audio, **kwargs)
        if text is not None and audio is not None:
            out["labels"] = out.pop("input_ids")
        return BatchFeature(dict(out))
