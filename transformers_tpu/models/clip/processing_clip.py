"""CLIP processor (reference models/clip/processing_clip.py)."""

from __future__ import annotations

from ...processing_utils import ProcessorMixin


class CLIPProcessor(ProcessorMixin):
    attributes = ["image_processor", "tokenizer"]
