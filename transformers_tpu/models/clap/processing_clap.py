"""CLAP processor (reference models/clap/processing_clap.py): RoBERTa
tokenizer + CLAP feature extractor."""

from __future__ import annotations

from ...processing_utils import ProcessorMixin


class ClapProcessor(ProcessorMixin):
    attributes = ["feature_extractor", "tokenizer"]

    def __call__(self, text=None, audios=None, audio=None, **kwargs):
        return super().__call__(text=text, audio=audio if audio is not None else audios,
                                **kwargs)
