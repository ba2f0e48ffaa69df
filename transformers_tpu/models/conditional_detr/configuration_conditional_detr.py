"""Conditional DETR config (reference
models/conditional_detr/configuration_conditional_detr.py) — DETR fields +
the focal-loss knobs."""

from __future__ import annotations

from ..detr.configuration_detr import DetrConfig


class ConditionalDetrConfig(DetrConfig):
    model_type = "conditional_detr"

    def __init__(self, focal_alpha: float = 0.25, cls_loss_coefficient: float = 2.0,
                 **kwargs):
        self.focal_alpha = focal_alpha
        self.cls_loss_coefficient = cls_loss_coefficient
        super().__init__(**kwargs)
