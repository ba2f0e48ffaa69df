"""AltCLIPProcessor: CLIP image processor + XLM-R tokenizer."""

from __future__ import annotations

from ...processing_utils import ProcessorMixin

class AltCLIPProcessor(ProcessorMixin):
    """Reference models/altclip/processing_altclip.py."""

    attributes = ["image_processor", "tokenizer"]
