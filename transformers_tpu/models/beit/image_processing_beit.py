"""BEiT image processor (reference models/beit/image_processing_beit.py):
224 bicubic + optional reduce_labels segmentation maps; shared by
data2vec-vision (auto mapping)."""

from __future__ import annotations

from ...image_processing_utils import (
    IMAGENET_STANDARD_MEAN,
    IMAGENET_STANDARD_STD,
    BaseImageProcessor,
)


class BeitImageProcessor(BaseImageProcessor):
    def __init__(self, **kwargs):
        kwargs.setdefault("size", {"height": 224, "width": 224})
        kwargs.setdefault("resample", "bicubic")
        kwargs.setdefault("do_reduce_labels", False)
        kwargs.setdefault("image_mean", IMAGENET_STANDARD_MEAN)
        kwargs.setdefault("image_std", IMAGENET_STANDARD_STD)
        super().__init__(**kwargs)
