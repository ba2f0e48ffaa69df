"""LeViT image processor (reference
models/levit/image_processing_levit.py): shortest edge is rescaled to
``int(256/224 * shortest_edge)`` before the 224 center crop."""

from __future__ import annotations

from ...image_processing_utils import (
    IMAGENET_DEFAULT_MEAN,
    IMAGENET_DEFAULT_STD,
    BaseImageProcessor,
)
from ...image_transforms import get_resize_output_size


class LevitImageProcessor(BaseImageProcessor):
    def __init__(self, **kwargs):
        kwargs.setdefault("size", {"shortest_edge": 224})
        kwargs.setdefault("resample", "bicubic")
        kwargs.setdefault("do_center_crop", True)
        kwargs.setdefault("crop_size", {"height": 224, "width": 224})
        kwargs.setdefault("image_mean", IMAGENET_DEFAULT_MEAN)
        kwargs.setdefault("image_std", IMAGENET_DEFAULT_STD)
        super().__init__(**kwargs)

    def resize_size(self, height: int, width: int) -> tuple[int, int]:
        if "shortest_edge" in self.size:
            shortest = int((256 / 224) * self.size["shortest_edge"])
            return get_resize_output_size(height, width, shortest)
        return super().resize_size(height, width)
