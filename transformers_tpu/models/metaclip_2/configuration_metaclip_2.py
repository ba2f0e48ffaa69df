"""MetaCLIP 2 configs (reference
src/transformers/models/metaclip_2/configuration_metaclip_2.py).

Worldwide-scaled CLIP: identical towers to CLIP; the text side defaults to
the XLM-V 901,629-token vocabulary and always pools at the first EOS token
(reference modeling_metaclip_2.py:497-499), unlike legacy CLIP's
argmax-of-ids pooling for eos_token_id == 2.
"""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig
from ..clip.configuration_clip import CLIPTextConfig, CLIPVisionConfig


class MetaClip2TextConfig(CLIPTextConfig):
    model_type = "metaclip_2_text_model"


class MetaClip2VisionConfig(CLIPVisionConfig):
    model_type = "metaclip_2_vision_model"


class MetaClip2Config(PretrainedConfig):
    model_type = "metaclip_2"
    sub_configs = {"text_config": MetaClip2TextConfig,
                   "vision_config": MetaClip2VisionConfig}

    def __init__(self, text_config=None, vision_config=None, projection_dim=512,
                 logit_scale_init_value=2.6592, **kwargs):
        if isinstance(text_config, dict) or text_config is None:
            text_config = MetaClip2TextConfig(**(text_config or {}))
        if isinstance(vision_config, dict) or vision_config is None:
            vision_config = MetaClip2VisionConfig(**(vision_config or {}))
        self.text_config = text_config
        self.vision_config = vision_config
        self.projection_dim = projection_dim
        self.logit_scale_init_value = logit_scale_init_value
        self.initializer_factor = 1.0
        super().__init__(**kwargs)
