"""IDEFICS image processor (reference models/idefics/image_processing_idefics.py):
bicubic resize to a square ``image_size`` (224), RGB convert, CLIP
mean/std normalization — no center crop."""

from __future__ import annotations

from ...image_processing_utils import (
    OPENAI_CLIP_MEAN,
    OPENAI_CLIP_STD,
    BaseImageProcessor,
)


class IdeficsImageProcessor(BaseImageProcessor):
    def __init__(self, image_size=224, **kwargs):
        kwargs.setdefault("size", {"height": image_size, "width": image_size})
        kwargs.setdefault("resample", "bicubic")
        kwargs.setdefault("image_mean", OPENAI_CLIP_MEAN)
        kwargs.setdefault("image_std", OPENAI_CLIP_STD)
        kwargs.setdefault("do_convert_rgb", True)
        super().__init__(**kwargs)
        self.image_size = image_size
