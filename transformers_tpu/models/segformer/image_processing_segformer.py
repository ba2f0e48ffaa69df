"""SegFormer image processor (reference
models/segformer/image_processing_segformer.py): 512x512 resize,
``do_reduce_labels`` for ADE-convention segmentation maps, and semantic
post-processing. Also serves UperNet (auto mapping)."""

from __future__ import annotations

from ...image_processing_utils import (
    IMAGENET_DEFAULT_MEAN,
    IMAGENET_DEFAULT_STD,
    BaseImageProcessor,
)


class SegformerImageProcessor(BaseImageProcessor):
    def __init__(self, **kwargs):
        kwargs.setdefault("size", {"height": 512, "width": 512})
        kwargs.setdefault("do_reduce_labels", False)
        kwargs.setdefault("image_mean", IMAGENET_DEFAULT_MEAN)
        kwargs.setdefault("image_std", IMAGENET_DEFAULT_STD)
        super().__init__(**kwargs)
