"""OWLv2 processor (reference models/owlv2/processing_owlv2.py): identical
calling convention to OwlViT's — nested text queries stacked, query_images
-> query_pixel_values."""

from __future__ import annotations

from ..owlvit.processing_owlvit import OwlViTProcessor


class Owlv2Processor(OwlViTProcessor):
    pass
