"""PoolFormer image processor (reference
models/poolformer/image_processing_poolformer.py): shortest edge resized to
``size/crop_pct`` then center-cropped to crop_size."""

from __future__ import annotations

from ...image_processing_utils import (
    IMAGENET_DEFAULT_MEAN,
    IMAGENET_DEFAULT_STD,
    BaseImageProcessor,
)
from ...image_transforms import get_resize_output_size


class PoolFormerImageProcessor(BaseImageProcessor):
    def __init__(self, **kwargs):
        kwargs.setdefault("size", {"shortest_edge": 224})
        kwargs.setdefault("resample", "bicubic")
        kwargs.setdefault("crop_pct", 0.9)
        kwargs.setdefault("do_center_crop", True)
        kwargs.setdefault("crop_size", {"height": 224, "width": 224})
        kwargs.setdefault("image_mean", IMAGENET_DEFAULT_MEAN)
        kwargs.setdefault("image_std", IMAGENET_DEFAULT_STD)
        super().__init__(**kwargs)

    def resize_size(self, height: int, width: int) -> tuple[int, int]:
        if self.crop_pct and "shortest_edge" in self.size:
            scale = int(self.size["shortest_edge"] / self.crop_pct)
            return get_resize_output_size(height, width, scale)
        if self.crop_pct and "height" in self.size:
            if self.size["height"] == self.size["width"]:
                scale = int(self.size["height"] / self.crop_pct)
                return get_resize_output_size(height, width, scale)
            return (int(self.size["height"] / self.crop_pct),
                    int(self.size["width"] / self.crop_pct))
        return super().resize_size(height, width)
