"""BLIP image processor (reference models/blip/image_processing_blip.py:
resize 384x384 bicubic, rescale 1/255, normalize with OpenAI CLIP mean/std)."""

from __future__ import annotations

from ...image_processing_utils import OPENAI_CLIP_MEAN, OPENAI_CLIP_STD, BaseImageProcessor


class BlipImageProcessor(BaseImageProcessor):
    def __init__(self, **kwargs):
        kwargs.setdefault("size", {"height": 384, "width": 384})
        kwargs.setdefault("resample", "bicubic")
        kwargs.setdefault("image_mean", OPENAI_CLIP_MEAN)
        kwargs.setdefault("image_std", OPENAI_CLIP_STD)
        super().__init__(**kwargs)
