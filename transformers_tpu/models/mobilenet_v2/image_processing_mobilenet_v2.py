"""MobileNetV2 image processor (reference
models/mobilenet_v2/image_processing_mobilenet_v2.py): shortest-edge 256
bilinear + 224 center crop; optional reduced segmentation labels."""

from __future__ import annotations

from ...image_processing_utils import (
    IMAGENET_STANDARD_MEAN,
    IMAGENET_STANDARD_STD,
    BaseImageProcessor,
)


class MobileNetV2ImageProcessor(BaseImageProcessor):
    def __init__(self, **kwargs):
        kwargs.setdefault("size", {"shortest_edge": 256})
        kwargs.setdefault("do_center_crop", True)
        kwargs.setdefault("crop_size", {"height": 224, "width": 224})
        kwargs.setdefault("do_reduce_labels", False)
        kwargs.setdefault("image_mean", IMAGENET_STANDARD_MEAN)
        kwargs.setdefault("image_std", IMAGENET_STANDARD_STD)
        super().__init__(**kwargs)


class MobileNetV1ImageProcessor(MobileNetV2ImageProcessor):
    """reference models/mobilenet_v1/image_processing_mobilenet_v1.py —
    identical geometry, no segmentation tier."""
