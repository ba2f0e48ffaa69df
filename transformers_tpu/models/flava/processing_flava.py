"""FlavaProcessor: CLIP-stat image processor + BERT tokenizer."""

from __future__ import annotations

from ...processing_utils import ProcessorMixin

class FlavaProcessor(ProcessorMixin):
    """Reference models/flava/processing_flava.py."""

    attributes = ["image_processor", "tokenizer"]
