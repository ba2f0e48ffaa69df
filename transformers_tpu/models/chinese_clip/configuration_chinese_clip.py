"""Chinese-CLIP configs (reference src/transformers/models/chinese_clip/configuration_chinese_clip.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig
from ..bert.configuration_bert import BertConfig
from ..clip.configuration_clip import CLIPVisionConfig


class ChineseCLIPTextConfig(BertConfig):
    model_type = "chinese_clip_text_model"


class ChineseCLIPVisionConfig(CLIPVisionConfig):
    model_type = "chinese_clip_vision_model"


class ChineseCLIPConfig(PretrainedConfig):
    model_type = "chinese_clip"
    sub_configs = {"text_config": ChineseCLIPTextConfig,
                   "vision_config": ChineseCLIPVisionConfig}

    def __init__(self, text_config=None, vision_config=None, projection_dim=512,
                 logit_scale_init_value=2.6592, **kwargs):
        if isinstance(text_config, dict) or text_config is None:
            text_config = ChineseCLIPTextConfig(**(text_config or {}))
        if isinstance(vision_config, dict) or vision_config is None:
            vision_config = ChineseCLIPVisionConfig(**(vision_config or {}))
        self.text_config = text_config
        self.vision_config = vision_config
        self.projection_dim = projection_dim
        self.logit_scale_init_value = logit_scale_init_value
        self.initializer_factor = 1.0
        self.initializer_range = 0.02
        super().__init__(**kwargs)
