"""AltCLIP configs (reference src/transformers/models/altclip/configuration_altclip.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig
from ..clip.configuration_clip import CLIPVisionConfig
from ..roberta.configuration_roberta import RobertaConfig


class AltCLIPTextConfig(RobertaConfig):
    model_type = "altclip_text_model"

    def __init__(self, vocab_size=250002, project_dim=768, **kwargs):
        self.project_dim = project_dim
        super().__init__(vocab_size=vocab_size, **kwargs)


class AltCLIPVisionConfig(CLIPVisionConfig):
    model_type = "altclip_vision_model"


class AltCLIPConfig(PretrainedConfig):
    model_type = "altclip"
    sub_configs = {"text_config": AltCLIPTextConfig,
                   "vision_config": AltCLIPVisionConfig}

    def __init__(self, text_config=None, vision_config=None, projection_dim=768,
                 logit_scale_init_value=2.6592, **kwargs):
        if isinstance(text_config, dict) or text_config is None:
            text_config = AltCLIPTextConfig(**(text_config or {}))
        if isinstance(vision_config, dict) or vision_config is None:
            vision_config = AltCLIPVisionConfig(**(vision_config or {}))
        self.text_config = text_config
        self.vision_config = vision_config
        self.projection_dim = projection_dim
        self.logit_scale_init_value = logit_scale_init_value
        self.initializer_factor = 1.0
        self.initializer_range = 0.02
        super().__init__(**kwargs)
