"""SigLIP2 configs (reference src/transformers/models/siglip2/configuration_siglip2.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig
from ..siglip.configuration_siglip import SiglipTextConfig


class Siglip2TextConfig(SiglipTextConfig):
    model_type = "siglip2_text_model"


class Siglip2VisionConfig(PretrainedConfig):
    model_type = "siglip2_vision_model"

    def __init__(
        self,
        hidden_size=768,
        intermediate_size=3072,
        num_hidden_layers=12,
        num_attention_heads=12,
        num_channels=3,
        num_patches=256,
        patch_size=16,
        hidden_act="gelu_pytorch_tanh",
        layer_norm_eps=1e-6,
        attention_dropout=0.0,
        **kwargs,
    ):
        self.hidden_size = hidden_size
        self.intermediate_size = intermediate_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.num_channels = num_channels
        self.num_patches = num_patches
        self.patch_size = patch_size
        self.hidden_act = hidden_act
        self.layer_norm_eps = layer_norm_eps
        self.attention_dropout = attention_dropout
        self.initializer_range = 0.02
        super().__init__(**kwargs)


class Siglip2Config(PretrainedConfig):
    model_type = "siglip2"
    sub_configs = {"text_config": Siglip2TextConfig, "vision_config": Siglip2VisionConfig}

    def __init__(self, text_config=None, vision_config=None, **kwargs):
        if isinstance(text_config, dict) or text_config is None:
            text_config = Siglip2TextConfig(**(text_config or {}))
        if isinstance(vision_config, dict) or vision_config is None:
            vision_config = Siglip2VisionConfig(**(vision_config or {}))
        self.text_config = text_config
        self.vision_config = vision_config
        self.initializer_factor = 1.0
        super().__init__(**kwargs)
