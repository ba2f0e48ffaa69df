"""Video-LLaVA video processor (reference
models/video_llava/video_processing_video_llava.py): CLIP-stat 224
shortest-edge resize + center crop per frame (LanguageBind tower)."""

from __future__ import annotations

from ... import image_transforms as T
from ...image_processing_utils import OPENAI_CLIP_MEAN, OPENAI_CLIP_STD
from ...video_processing_utils import BaseVideoProcessor


class VideoLlavaVideoProcessor(BaseVideoProcessor):
    def __init__(self, **kwargs):
        kwargs.setdefault("size", {"shortest_edge": 224})
        kwargs.setdefault("resample", "bicubic")
        kwargs.setdefault("do_center_crop", True)
        kwargs.setdefault("crop_size", {"height": 224, "width": 224})
        kwargs.setdefault("image_mean", OPENAI_CLIP_MEAN)
        kwargs.setdefault("image_std", OPENAI_CLIP_STD)
        super().__init__(**kwargs)

    def resize_size(self, height: int, width: int):
        return T.get_resize_output_size(height, width,
                                        self.size["shortest_edge"])
