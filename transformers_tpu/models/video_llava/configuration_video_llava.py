"""Video-LLaVA config (reference
models/video_llava/configuration_video_llava.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig
from ..auto.configuration_auto import get_config_class
from ..clip.configuration_clip import CLIPVisionConfig


class VideoLlavaConfig(PretrainedConfig):
    model_type = "video_llava"

    def __init__(self, vision_config=None, text_config=None,
                 image_token_index=32000, video_token_index=32001,
                 projector_hidden_act="gelu", vision_feature_select_strategy="default",
                 vision_feature_layer=-2, image_seq_length=256,
                 video_seq_length=2056, multimodal_projector_bias=True, **kwargs):
        if isinstance(vision_config, dict):
            vision_config = CLIPVisionConfig(**vision_config)
        elif vision_config is None:
            vision_config = CLIPVisionConfig()
        if isinstance(text_config, dict):
            text_config = get_config_class(text_config.get("model_type", "llama"))(**text_config)
        elif text_config is None:
            text_config = get_config_class("llama")()
        self.vision_config = vision_config
        self.text_config = text_config
        self.image_token_index = image_token_index
        self.video_token_index = video_token_index
        self.image_token_id = image_token_index
        self.video_token_id = video_token_index
        self.projector_hidden_act = projector_hidden_act
        self.vision_feature_select_strategy = vision_feature_select_strategy
        self.vision_feature_layer = vision_feature_layer
        self.image_seq_length = image_seq_length
        self.video_seq_length = video_seq_length
        self.multimodal_projector_bias = multimodal_projector_bias
        super().__init__(**kwargs)
