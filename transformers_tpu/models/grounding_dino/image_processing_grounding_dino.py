"""Grounding DINO image processor (reference
models/grounding_dino/image_processing_grounding_dino.py): the DETR
shortest-edge-800/longest-1333 resize + ImageNet normalization pipeline."""

from __future__ import annotations

from ..detr.image_processing_detr import DetrImageProcessor


class GroundingDinoImageProcessor(DetrImageProcessor):
    pass
