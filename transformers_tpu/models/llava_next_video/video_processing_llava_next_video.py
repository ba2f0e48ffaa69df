"""LLaVA-NeXT-Video video processor (reference
models/llava_next_video/video_processing_llava_next_video.py): CLIP-stat
336 shortest-edge resize + center crop per frame."""

from __future__ import annotations

from ...image_processing_utils import OPENAI_CLIP_MEAN, OPENAI_CLIP_STD
from ...video_processing_utils import BaseVideoProcessor
from ... import image_transforms as T


class LlavaNextVideoVideoProcessor(BaseVideoProcessor):
    def __init__(self, **kwargs):
        kwargs.setdefault("size", {"shortest_edge": 336})
        kwargs.setdefault("resample", "bicubic")
        kwargs.setdefault("do_center_crop", True)
        kwargs.setdefault("crop_size", {"height": 336, "width": 336})
        kwargs.setdefault("image_mean", OPENAI_CLIP_MEAN)
        kwargs.setdefault("image_std", OPENAI_CLIP_STD)
        super().__init__(**kwargs)

    def resize_size(self, height: int, width: int):
        return T.get_resize_output_size(height, width,
                                        self.size["shortest_edge"])
