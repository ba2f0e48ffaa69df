"""Mistral3 config (reference src/transformers/models/mistral3/configuration_mistral3.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig
from ..pixtral.configuration_pixtral import PixtralVisionConfig


class Mistral3Config(PretrainedConfig):
    model_type = "mistral3"
    sub_configs = {"vision_config": PixtralVisionConfig}

    def __init__(self, vision_config=None, text_config=None, image_token_index=10,
                 projector_hidden_act="gelu", vision_feature_layer=-1,
                 multimodal_projector_bias=False, spatial_merge_size=2, **kwargs):
        self.image_token_index = image_token_index
        self.image_token_id = image_token_index
        self.projector_hidden_act = projector_hidden_act
        self.vision_feature_layer = vision_feature_layer
        self.multimodal_projector_bias = multimodal_projector_bias
        self.spatial_merge_size = spatial_merge_size
        if isinstance(vision_config, dict) or vision_config is None:
            vision_config = PixtralVisionConfig(**(vision_config or {}))
        self.vision_config = vision_config
        if isinstance(text_config, dict) or text_config is None:
            from ..mistral.configuration_mistral import MistralConfig

            text_config = MistralConfig(**(text_config or {}))
        self.text_config = text_config
        super().__init__(**kwargs)
