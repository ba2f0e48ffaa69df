"""VisionTextDualEncoderProcessor: any image processor + any tokenizer."""

from __future__ import annotations

from ...processing_utils import ProcessorMixin

class VisionTextDualEncoderProcessor(ProcessorMixin):
    """Reference models/vision_text_dual_encoder/processing_vision_text_dual_encoder.py."""

    attributes = ["image_processor", "tokenizer"]
