"""TextNet image processor (reference
models/textnet/image_processing_textnet.py): shortest-edge 640 resize with
the longer side floored to a multiple of ``size_divisor`` 32."""

from __future__ import annotations

from ...image_processing_utils import (
    IMAGENET_DEFAULT_MEAN,
    IMAGENET_DEFAULT_STD,
    BaseImageProcessor,
)
from ...image_transforms import get_resize_output_size


class TextNetImageProcessor(BaseImageProcessor):
    def __init__(self, **kwargs):
        kwargs.setdefault("size", {"shortest_edge": 640})
        kwargs.setdefault("size_divisor", 32)
        kwargs.setdefault("image_mean", IMAGENET_DEFAULT_MEAN)
        kwargs.setdefault("image_std", IMAGENET_DEFAULT_STD)
        super().__init__(**kwargs)

    def resize_size(self, height: int, width: int) -> tuple[int, int]:
        h, w = get_resize_output_size(height, width, self.size["shortest_edge"])
        d = self.size_divisor
        return (max(d, (h // d) * d), max(d, (w // d) * d))
