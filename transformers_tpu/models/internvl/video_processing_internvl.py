"""InternVL video processor (reference
models/internvl/video_processing_internvl.py): fixed 384x384 per frame,
CLIP stats (the crop-to-patches tier applies to images only)."""

from __future__ import annotations

from ...image_processing_utils import OPENAI_CLIP_MEAN, OPENAI_CLIP_STD
from ...video_processing_utils import BaseVideoProcessor


class InternVLVideoProcessor(BaseVideoProcessor):
    def __init__(self, **kwargs):
        kwargs.setdefault("size", {"height": 384, "width": 384})
        kwargs.setdefault("resample", "bicubic")
        kwargs.setdefault("image_mean", OPENAI_CLIP_MEAN)
        kwargs.setdefault("image_std", OPENAI_CLIP_STD)
        super().__init__(**kwargs)

    def resize_size(self, height: int, width: int):
        return (self.size["height"], self.size["width"])
