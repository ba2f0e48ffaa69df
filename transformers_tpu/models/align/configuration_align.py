"""ALIGN configs (reference src/transformers/models/align/configuration_align.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig
from ..bert.configuration_bert import BertConfig
from ..efficientnet.configuration_efficientnet import EfficientNetConfig


class AlignTextConfig(BertConfig):
    model_type = "align_text_model"


class AlignVisionConfig(EfficientNetConfig):
    model_type = "align_vision_model"


class AlignConfig(PretrainedConfig):
    model_type = "align"
    sub_configs = {"text_config": AlignTextConfig,
                   "vision_config": AlignVisionConfig}

    def __init__(self, text_config=None, vision_config=None, projection_dim=640,
                 temperature_init_value=1.0, initializer_range=0.02, **kwargs):
        if isinstance(text_config, dict) or text_config is None:
            text_config = AlignTextConfig(**(text_config or {}))
        if isinstance(vision_config, dict) or vision_config is None:
            vision_config = AlignVisionConfig(**(vision_config or {}))
        self.text_config = text_config
        self.vision_config = vision_config
        self.projection_dim = projection_dim
        self.temperature_init_value = temperature_init_value
        self.initializer_range = initializer_range
        super().__init__(**kwargs)
