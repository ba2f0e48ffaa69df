"""BROS processor (reference models/bros/processing_bros.py): plain BERT
tokenization; the caller supplies per-token bounding boxes to the model
(the reference processor is tokenizer-only)."""

from __future__ import annotations

from ...processing_utils import ProcessorMixin


class BrosProcessor(ProcessorMixin):
    attributes = ["tokenizer"]

    def __call__(self, text=None, **kwargs):
        return super().__call__(text=text, **kwargs)
