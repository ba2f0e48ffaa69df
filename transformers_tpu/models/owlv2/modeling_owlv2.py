"""OWLv2 (reference src/transformers/models/owlv2/modeling_owlv2.py).

OwlViT zero-shot detector plus a 3-layer ``objectness_head`` scoring each
image patch (image-guided detection / score calibration); checkpoint prefix
``owlv2``."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax.numpy as jnp

from ...utils.generic import ModelOutput
from ..owlvit.configuration_owlvit import OwlViTConfig
from ..owlvit.modeling_owlvit import OwlViTForObjectDetection, _BoxHead


class Owlv2Config(OwlViTConfig):
    model_type = "owlv2"


@dataclass
class Owlv2ObjectDetectionOutput(ModelOutput):
    logits: Any = None
    objectness_logits: Any = None
    pred_boxes: Any = None
    text_embeds: Any = None
    image_embeds: Any = None
    class_embeds: Any = None


class Owlv2ForObjectDetection(OwlViTForObjectDetection):
    config_class = Owlv2Config
    base_attr = "owlv2"

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.objectness_head = _BoxHead(config, dtype=self.dtype,
                                        param_dtype=self.param_dtype, out_dim=1)

    def __call__(self, params, input_ids=None, pixel_values=None, attention_mask=None,
                 **kwargs) -> Owlv2ObjectDetectionOutput:
        base = super().__call__(params, input_ids, pixel_values, attention_mask)
        objness = self.objectness_head(params["objectness_head"], base.image_embeds)
        return Owlv2ObjectDetectionOutput(
            logits=base.logits, objectness_logits=objness[..., 0],
            pred_boxes=base.pred_boxes, text_embeds=base.text_embeds,
            image_embeds=base.image_embeds, class_embeds=base.class_embeds)
