"""SigLIP image processor (reference models/siglip/image_processing_siglip.py):
resize to 224x224 bilinear (no crop), rescale, mean/std 0.5."""

from __future__ import annotations

from ...image_processing_utils import (
    IMAGENET_STANDARD_MEAN,
    IMAGENET_STANDARD_STD,
    BaseImageProcessor,
)


class SiglipImageProcessor(BaseImageProcessor):
    def __init__(self, **kwargs):
        kwargs.setdefault("size", {"height": 224, "width": 224})
        kwargs.setdefault("resample", "bicubic")
        kwargs.setdefault("image_mean", IMAGENET_STANDARD_MEAN)
        kwargs.setdefault("image_std", IMAGENET_STANDARD_STD)
        super().__init__(**kwargs)
