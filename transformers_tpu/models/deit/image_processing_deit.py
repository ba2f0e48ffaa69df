"""DeiT image processor (reference models/deit/image_processing_deit.py):
256x256 bicubic resize + 224 center crop."""

from __future__ import annotations

from ...image_processing_utils import (
    IMAGENET_STANDARD_MEAN,
    IMAGENET_STANDARD_STD,
    BaseImageProcessor,
)


class DeiTImageProcessor(BaseImageProcessor):
    def __init__(self, **kwargs):
        kwargs.setdefault("size", {"height": 256, "width": 256})
        kwargs.setdefault("resample", "bicubic")
        kwargs.setdefault("do_center_crop", True)
        kwargs.setdefault("crop_size", {"height": 224, "width": 224})
        kwargs.setdefault("image_mean", IMAGENET_STANDARD_MEAN)
        kwargs.setdefault("image_std", IMAGENET_STANDARD_STD)
        super().__init__(**kwargs)
