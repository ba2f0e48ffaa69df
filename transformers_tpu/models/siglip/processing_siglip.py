"""SigLIP processor (reference models/siglip/processing_siglip.py)."""

from __future__ import annotations

from ...processing_utils import ProcessorMixin


class SiglipProcessor(ProcessorMixin):
    attributes = ["image_processor", "tokenizer"]
