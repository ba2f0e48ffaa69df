"""MobileViT image processor (reference
models/mobilevit/image_processing_mobilevit.py): shortest-edge 224 resize,
256 center crop, NO normalization, and RGB->BGR channel flip
(``do_flip_channel_order``). Serves mobilevitv2 too (auto mapping)."""

from __future__ import annotations

import numpy as np

from ...image_processing_utils import BaseImageProcessor
from ... import image_transforms as T


class MobileViTImageProcessor(BaseImageProcessor):
    def __init__(self, **kwargs):
        kwargs.setdefault("size", {"shortest_edge": 224})
        kwargs.setdefault("resample", "bicubic")
        kwargs.setdefault("do_center_crop", True)
        kwargs.setdefault("crop_size", {"height": 256, "width": 256})
        kwargs.setdefault("do_normalize", False)
        kwargs.setdefault("do_flip_channel_order", True)
        kwargs.setdefault("do_reduce_labels", False)
        super().__init__(**kwargs)

    def _process_batch(self, batch):
        x = super()._process_batch(batch)
        if self.do_flip_channel_order:
            x = x[..., ::-1, :, :]
        return x

    def _process_exact(self, arr):
        x = super()._process_exact(arr)
        if self.do_flip_channel_order:
            x = np.ascontiguousarray(x[::-1])
        return x
