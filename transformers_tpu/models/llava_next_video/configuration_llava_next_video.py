"""LLaVA-NeXT-Video config (reference
src/transformers/models/llava_next_video/configuration_llava_next_video.py)."""

from __future__ import annotations

from ..llava_next.configuration_llava_next import LlavaNextConfig


class LlavaNextVideoConfig(LlavaNextConfig):
    model_type = "llava_next_video"

    def __init__(self, video_token_index=32000, spatial_pool_mode="average",
                 spatial_pool_stride=2, video_seq_length=288, **kwargs):
        self.video_token_index = video_token_index
        self.video_token_id = video_token_index
        self.spatial_pool_mode = spatial_pool_mode
        self.spatial_pool_stride = spatial_pool_stride
        self.video_seq_length = video_seq_length
        super().__init__(**kwargs)
