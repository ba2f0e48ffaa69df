"""Whisper processor (reference models/whisper/processing_whisper.py):
feature extractor for audio + tokenizer for text."""

from __future__ import annotations

from ...processing_utils import ProcessorMixin


class WhisperProcessor(ProcessorMixin):
    attributes = ["feature_extractor", "tokenizer"]

    def __call__(self, audio=None, text=None, sampling_rate=None, return_tensors="jax", **kwargs):
        from ...image_processing_utils import BatchFeature

        data = {}
        if audio is not None:
            data.update(self.feature_extractor(audio, sampling_rate=sampling_rate,
                                               return_tensors=return_tensors))
        if text is not None:
            data.update(self.tokenizer(text, return_tensors=return_tensors, **kwargs))
        return BatchFeature(data)
