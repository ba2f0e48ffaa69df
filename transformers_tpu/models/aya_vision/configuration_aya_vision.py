"""Aya Vision config (reference
src/transformers/models/aya_vision/configuration_aya_vision.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig
from ...models.auto.configuration_auto import get_config_class


class AyaVisionConfig(PretrainedConfig):
    model_type = "aya_vision"
    sub_configs = {"text_config": "auto", "vision_config": "auto"}

    def __init__(self, vision_config=None, text_config=None, vision_feature_select_strategy="full",
                 vision_feature_layer=-1, downsample_factor=2, adapter_layer_norm_eps=1e-6,
                 image_token_index=255036, **kwargs):
        if isinstance(vision_config, dict):
            cls = get_config_class(vision_config.get("model_type", "siglip_vision_model"))
            vision_config = cls(**{k: v for k, v in vision_config.items() if k != "model_type"})
        elif vision_config is None:
            vision_config = get_config_class("siglip_vision_model")()
        if isinstance(text_config, dict):
            model_type = text_config.get("model_type", "cohere2")
            cls = get_config_class(model_type)
            text_config = cls(**{k: v for k, v in text_config.items() if k != "model_type"})
        elif text_config is None:
            text_config = get_config_class("cohere2")()
        self.vision_config = vision_config
        self.text_config = text_config
        self.vision_feature_select_strategy = vision_feature_select_strategy
        self.vision_feature_layer = vision_feature_layer
        self.downsample_factor = downsample_factor
        self.adapter_layer_norm_eps = adapter_layer_norm_eps
        self.image_token_index = image_token_index
        self.image_token_id = image_token_index
        super().__init__(**kwargs)
