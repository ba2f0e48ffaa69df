"""ChineseCLIPProcessor: BiT-stat image processor + BERT tokenizer."""

from __future__ import annotations

from ...processing_utils import ProcessorMixin

class ChineseCLIPProcessor(ProcessorMixin):
    """Reference models/chinese_clip/processing_chinese_clip.py."""

    attributes = ["image_processor", "tokenizer"]
