"""ConvNeXT image processor (reference
models/convnext/image_processing_convnext.py:96-130): below 384 the shortest
edge is resized to ``size/crop_pct`` then center-cropped square; at 384+ the
image is warped square with no crop. Shared by resnet/regnet/cvt via the
auto mapping (reference models/auto/image_processing_auto.py)."""

from __future__ import annotations

from ...image_processing_utils import (
    IMAGENET_STANDARD_MEAN,
    IMAGENET_STANDARD_STD,
    BaseImageProcessor,
)
from ...image_transforms import get_resize_output_size


class ConvNextImageProcessor(BaseImageProcessor):
    def __init__(self, **kwargs):
        kwargs.setdefault("size", {"shortest_edge": 384})
        kwargs.setdefault("resample", "bicubic")
        kwargs.setdefault("crop_pct", 224 / 256)
        kwargs.setdefault("image_mean", IMAGENET_STANDARD_MEAN)
        kwargs.setdefault("image_std", IMAGENET_STANDARD_STD)
        super().__init__(**kwargs)

    def resize_size(self, height: int, width: int) -> tuple[int, int]:
        shortest = self.size.get("shortest_edge") or self.size.get("height")
        if shortest >= 384:
            return (shortest, shortest)  # warp, no crop
        resize_shortest = int(shortest / self.crop_pct)
        return get_resize_output_size(height, width, resize_shortest)

    def _crop_target(self) -> dict | None:
        shortest = self.size.get("shortest_edge") or self.size.get("height")
        return None if shortest >= 384 else {"height": shortest, "width": shortest}

    def _process_batch(self, batch):
        # route the <384 crop through the base crop machinery
        crop = self._crop_target()
        self.do_center_crop = crop is not None
        self.crop_size = crop
        return super()._process_batch(batch)

    def _process_exact(self, arr):
        crop = self._crop_target()
        self.do_center_crop = crop is not None
        self.crop_size = crop
        return super()._process_exact(arr)


class ConvNextV2ImageProcessor(ConvNextImageProcessor):
    pass
