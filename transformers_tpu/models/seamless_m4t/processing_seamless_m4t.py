"""SeamlessM4T processor (reference
models/seamless_m4t/processing_seamless_m4t.py): text OR audio input (not
both), tokenizer carries src_lang/tgt_lang."""

from __future__ import annotations

from ...image_processing_utils import BatchFeature
from ...processing_utils import ProcessorMixin


class SeamlessM4TProcessor(ProcessorMixin):
    attributes = ["feature_extractor", "tokenizer"]

    def __call__(self, text=None, audios=None, audio=None, src_lang=None,
                 tgt_lang=None, return_tensors="np", padding=True,
                 **kwargs) -> BatchFeature:
        audio = audio if audio is not None else audios
        if text is not None and audio is not None:
            raise ValueError("text and audio are mutually exclusive "
                             "(reference processing_seamless_m4t.py:61)")
        if text is None and audio is None:
            raise ValueError("Pass text or audio.")
        if tgt_lang is not None:
            self.tokenizer.tgt_lang = tgt_lang
        if src_lang is not None:
            self.tokenizer.src_lang = src_lang
        if text is not None:
            return BatchFeature(dict(self.tokenizer(
                text if not isinstance(text, str) else [text],
                return_tensors=return_tensors, padding=padding)))
        return BatchFeature(dict(self.feature_extractor(
            audio, return_tensors=return_tensors, **kwargs)))
