"""LLaVA-OneVision config (reference
src/transformers/models/llava_onevision/configuration_llava_onevision.py)."""

from __future__ import annotations

from ..llava_next.configuration_llava_next import LlavaNextConfig


class LlavaOnevisionConfig(LlavaNextConfig):
    model_type = "llava_onevision"

    def __init__(self, video_token_index=151647, vision_aspect_ratio="anyres_max_9",
                 **kwargs):
        self.video_token_index = video_token_index
        self.video_token_id = video_token_index
        self.vision_aspect_ratio = vision_aspect_ratio
        kwargs.setdefault("vision_feature_select_strategy", "full")
        kwargs.setdefault("image_token_index", 151646)
        super().__init__(**kwargs)
