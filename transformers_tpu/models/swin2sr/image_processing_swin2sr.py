"""Swin2SR image processor (reference models/swin2sr/image_processing_swin2sr.py):
rescale 1/255 and REFLECT-pad H/W up to a multiple of ``size_divisor`` (8,
the window size) — no resize, SR operates at native resolution."""

from __future__ import annotations

import numpy as np

from ...image_processing_utils import BaseImageProcessor, BatchFeature


class Swin2SRImageProcessor(BaseImageProcessor):
    def __init__(self, do_rescale=True, rescale_factor=1 / 255,
                 do_pad=True, size_divisor=8, **kwargs):
        kwargs.pop("pad_size", None)
        kwargs.setdefault("do_resize", False)
        kwargs.setdefault("do_normalize", False)
        super().__init__(do_rescale=do_rescale, rescale_factor=rescale_factor,
                         **kwargs)
        self.do_pad = do_pad
        self.size_divisor = size_divisor

    def preprocess(self, images, return_tensors="jax", **kwargs) -> BatchFeature:
        out = super().preprocess(images, return_tensors="np", **kwargs)
        pixels = np.asarray(out["pixel_values"])
        if self.do_pad:
            h, w = pixels.shape[-2], pixels.shape[-1]
            d = self.size_divisor
            ph = (d - h % d) % d
            pw = (d - w % d) % d
            pixels = np.pad(pixels, ((0, 0), (0, 0), (0, ph), (0, pw)),
                            mode="symmetric")
        data = BatchFeature({"pixel_values": pixels})
        if return_tensors == "jax":
            import jax.numpy as jnp

            data["pixel_values"] = jnp.asarray(pixels)
        return data
