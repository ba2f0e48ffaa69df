"""LLaVA-OneVision video processor (reference
models/llava_onevision/video_processing_llava_onevision.py): per-frame
384x384 SigLIP-stat resize -> pixel_values_videos [B, T, C, H, W]."""

from __future__ import annotations

from ...image_processing_utils import OPENAI_CLIP_MEAN, OPENAI_CLIP_STD
from ...video_processing_utils import BaseVideoProcessor


class LlavaOnevisionVideoProcessor(BaseVideoProcessor):
    def __init__(self, **kwargs):
        kwargs.setdefault("size", {"height": 384, "width": 384})
        kwargs.setdefault("resample", "bicubic")
        kwargs.setdefault("image_mean", [0.5, 0.5, 0.5])
        kwargs.setdefault("image_std", [0.5, 0.5, 0.5])
        super().__init__(**kwargs)

    def resize_size(self, height: int, width: int):
        return (self.size["height"], self.size["width"])
