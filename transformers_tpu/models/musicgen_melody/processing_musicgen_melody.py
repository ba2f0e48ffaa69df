"""Musicgen-Melody processor (reference
models/musicgen_melody/processing_musicgen_melody.py): T5 tokenizer + chroma
feature extractor."""

from __future__ import annotations

from ...image_processing_utils import BatchFeature
from ...processing_utils import ProcessorMixin


class MusicgenMelodyProcessor(ProcessorMixin):
    attributes = ["feature_extractor", "tokenizer"]

    def __call__(self, audio=None, text=None, return_tensors="np",
                 padding=True, **kwargs) -> BatchFeature:
        data: dict = {}
        if text is not None:
            data.update(self.tokenizer(text if not isinstance(text, str) else [text],
                                       return_tensors=return_tensors, padding=padding))
        if audio is not None:
            data.update(self.feature_extractor(audio, return_tensors=return_tensors,
                                               **kwargs))
        return BatchFeature(data)
