"""ViltProcessor: ViLT pad-with-mask image processor + BERT tokenizer."""

from __future__ import annotations

from ...processing_utils import ProcessorMixin

class ViltProcessor(ProcessorMixin):
    """Reference models/vilt/processing_vilt.py."""

    attributes = ["image_processor", "tokenizer"]
