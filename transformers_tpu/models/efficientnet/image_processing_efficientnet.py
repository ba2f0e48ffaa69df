"""EfficientNet image processor (reference
models/efficientnet/image_processing_efficientnet.py): optional [-1, 1]
rescale offset and ``include_top`` second std-normalization for the
classification head. Also serves ALIGN (auto mapping)."""

from __future__ import annotations

import numpy as np

from ...image_processing_utils import (
    IMAGENET_STANDARD_MEAN,
    IMAGENET_STANDARD_STD,
    BaseImageProcessor,
)
from ... import image_transforms as T


class EfficientNetImageProcessor(BaseImageProcessor):
    def __init__(self, **kwargs):
        kwargs.setdefault("size", {"height": 346, "width": 346})
        kwargs.setdefault("resample", "nearest")
        kwargs.setdefault("rescale_offset", False)
        kwargs.setdefault("include_top", True)
        kwargs.setdefault("image_mean", IMAGENET_STANDARD_MEAN)
        kwargs.setdefault("image_std", IMAGENET_STANDARD_STD)
        super().__init__(**kwargs)

    def _process_batch(self, batch):
        import jax.numpy as jnp

        x = batch.astype(jnp.float32)
        if self.do_resize:
            h, w = x.shape[-2], x.shape[-1]
            x = T.resize(x, self.resize_size(h, w), resample=self.resample)
        if self.do_center_crop and self.crop_size:
            x = T.center_crop(x, (self.crop_size["height"], self.crop_size["width"]))
        if self.do_rescale:
            x = x * self.rescale_factor
            if self.rescale_offset:
                # [-max/2, max/2] band (reference :76-80)
                x = x - 1
        if self.do_normalize:
            x = T.normalize(x, self.image_mean, self.image_std)
            if self.include_top:
                # second normalization by std alone (reference :163-164)
                x = T.normalize(x, [0.0] * len(self.image_std), self.image_std)
        return x

    def _process_exact(self, arr):
        filt = {0: "nearest", 2: "bilinear", 3: "bicubic"}.get(self.resample, self.resample)
        if self.do_resize:
            arr = T.pil_exact_resize(arr, self.resize_size(*arr.shape[-2:]), filt)
        if self.do_center_crop and self.crop_size:
            ch, cw = self.crop_size["height"], self.crop_size["width"]
            top = (arr.shape[-2] - ch) // 2
            left = (arr.shape[-1] - cw) // 2
            arr = arr[..., top:top + ch, left:left + cw]
        x = arr.astype(np.float64) * self.rescale_factor
        if self.rescale_offset:
            x = x - 1
        x = x.astype(np.float32)
        if self.do_normalize:
            mean = np.array(self.image_mean, np.float32)
            std = np.array(self.image_std, np.float32)
            x = ((x.T - mean) / std).T
            if self.include_top:
                x = (x.T / std).T
        return np.ascontiguousarray(x, np.float32)
