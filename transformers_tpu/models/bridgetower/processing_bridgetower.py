"""BridgeTower processor (reference
models/bridgetower/processing_bridgetower.py): BridgeTower image processor
(pixel_values + pixel_mask) + RoBERTa tokenizer."""

from __future__ import annotations

from ...processing_utils import ProcessorMixin


class BridgeTowerProcessor(ProcessorMixin):
    attributes = ["image_processor", "tokenizer"]
