"""PVT image processor (reference models/pvt/image_processing_pvt.py):
224x224 with ImageNet-default statistics. Serves pvt_v2 (auto mapping)."""

from __future__ import annotations

from ...image_processing_utils import (
    IMAGENET_DEFAULT_MEAN,
    IMAGENET_DEFAULT_STD,
    BaseImageProcessor,
)


class PvtImageProcessor(BaseImageProcessor):
    def __init__(self, **kwargs):
        kwargs.setdefault("size", {"height": 224, "width": 224})
        kwargs.setdefault("image_mean", IMAGENET_DEFAULT_MEAN)
        kwargs.setdefault("image_std", IMAGENET_DEFAULT_STD)
        super().__init__(**kwargs)
