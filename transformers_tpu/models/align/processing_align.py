"""AlignProcessor: EfficientNet image processor + BERT tokenizer; reference tokenizes at padding='max_length', max_length=64 by default."""

from __future__ import annotations

from ...processing_utils import ProcessorMixin

class AlignProcessor(ProcessorMixin):
    """Reference models/align/processing_align.py: defaults to
    padding="max_length", max_length=64 for the text tower."""

    attributes = ["image_processor", "tokenizer"]

    def __call__(self, text=None, images=None, padding="max_length",
                 max_length=64, **kwargs):
        return super().__call__(text=text, images=images, padding=padding,
                                max_length=max_length, **kwargs)
