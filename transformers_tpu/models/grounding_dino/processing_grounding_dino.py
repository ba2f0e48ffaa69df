"""Grounding DINO processor (reference
models/grounding_dino/processing_grounding_dino.py): BERT-tokenized text
prompts (lowercased, '.'-terminated category lists) + DETR-style pixels."""

from __future__ import annotations

from ...image_processing_utils import BatchFeature
from ...processing_utils import ProcessorMixin


class GroundingDinoProcessor(ProcessorMixin):
    attributes = ["image_processor", "tokenizer"]

    def __call__(self, images=None, text=None, return_tensors="jax",
                 padding=True, **kwargs) -> BatchFeature:
        data = {}
        if images is not None:
            data.update(self.image_processor(images,
                                             return_tensors=return_tensors))
        if text is not None:
            if isinstance(text, (list, tuple)) and text and isinstance(text[0], (list, tuple)):
                # list of category lists -> "cat1. cat2." phrase format
                text = [". ".join(t).lower().strip() + "." for t in text]
            data.update(self.tokenizer(text, return_tensors=return_tensors,
                                       padding=padding, **kwargs))
        return BatchFeature(data)
