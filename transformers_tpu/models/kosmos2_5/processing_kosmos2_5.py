"""KOSMOS-2.5 processor (reference models/kosmos2_5/processing_kosmos2_5.py):
flattened patches + tokenized prompt; image placeholders are the boi/eoi
pair around ``num_image_tokens`` slots."""

from __future__ import annotations

from ...image_processing_utils import BatchFeature
from ...processing_utils import ProcessorMixin


class Kosmos2_5Processor(ProcessorMixin):
    attributes = ["image_processor", "tokenizer"]

    def __init__(self, image_processor=None, tokenizer=None,
                 num_image_tokens=2048, **kwargs):
        super().__init__(image_processor=image_processor, tokenizer=tokenizer,
                         **kwargs)
        self.num_image_tokens = num_image_tokens

    def __call__(self, images=None, text=None, return_tensors="jax",
                 padding=True, **kwargs) -> BatchFeature:
        data = {}
        if images is not None:
            data.update(self.image_processor(images,
                                             return_tensors=return_tensors))
        if text is not None:
            data.update(self.tokenizer(text, return_tensors=return_tensors,
                                       padding=padding, **kwargs))
        return BatchFeature(data)
