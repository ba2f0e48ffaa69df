"""VipLlava config (reference src/transformers/models/vipllava/configuration_vipllava.py)."""

from __future__ import annotations

from ..llava.configuration_llava import LlavaConfig


class VipLlavaConfig(LlavaConfig):
    model_type = "vipllava"

    def __init__(self, projector_layernorm_eps=1e-5, vision_feature_layers=None,
                 **kwargs):
        kwargs.pop("vision_feature_select_strategy", None)
        kwargs.pop("vision_feature_layer", None)
        super().__init__(**kwargs)
        self.projector_layernorm_eps = projector_layernorm_eps
        self.vision_feature_layers = (vision_feature_layers if vision_feature_layers
                                      is not None else [-2, -5, -8, -11, 6])
