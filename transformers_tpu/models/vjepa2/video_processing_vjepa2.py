"""V-JEPA2 video processor (reference
models/vjepa2/video_processing_vjepa2.py): shortest-edge 256 resize + 256
crop, ImageNet stats."""

from __future__ import annotations

from ... import image_transforms as T
from ...image_processing_utils import (
    IMAGENET_STANDARD_MEAN,
    IMAGENET_STANDARD_STD,
)
from ...video_processing_utils import BaseVideoProcessor


class VJEPA2VideoProcessor(BaseVideoProcessor):
    def __init__(self, **kwargs):
        kwargs.setdefault("size", {"shortest_edge": 256})
        kwargs.setdefault("resample", "bilinear")
        kwargs.setdefault("do_center_crop", True)
        kwargs.setdefault("crop_size", {"height": 256, "width": 256})
        kwargs.setdefault("image_mean", IMAGENET_STANDARD_MEAN)
        kwargs.setdefault("image_std", IMAGENET_STANDARD_STD)
        super().__init__(**kwargs)

    def resize_size(self, height: int, width: int):
        return T.get_resize_output_size(height, width, self.size["shortest_edge"])
