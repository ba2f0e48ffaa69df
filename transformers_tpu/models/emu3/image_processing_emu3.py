"""Emu3 image processor (reference models/emu3/image_processing_emu3.py):
smart-resize to multiples of spatial_factor 8 within [min_pixels,
max_pixels]; emits per-image ``image_sizes`` consumed by the VQ-VAE encode
and the processor's placeholder expansion."""

from __future__ import annotations

import numpy as np

from ...image_processing_utils import (
    BaseImageProcessor,
    BatchFeature,
    load_image,
)
from ..qwen2_vl.image_processing_qwen2_vl import smart_resize


class Emu3ImageProcessor(BaseImageProcessor):
    def __init__(self, **kwargs):
        kwargs.setdefault("resample", "bicubic")
        kwargs.setdefault("image_mean", [0.48145466, 0.4578275, 0.40821073])
        kwargs.setdefault("image_std", [0.26862954, 0.26130258, 0.27577711])
        self.spatial_factor = kwargs.pop("spatial_factor", 8)
        self.min_pixels = kwargs.pop("min_pixels", 512 * 512)
        self.max_pixels = kwargs.pop("max_pixels", 1024 * 1024)
        super().__init__(**kwargs)

    def resize_size(self, height: int, width: int):
        return smart_resize(height, width, factor=self.spatial_factor,
                            min_pixels=self.min_pixels,
                            max_pixels=self.max_pixels)

    def preprocess(self, images, return_tensors="jax", **kwargs) -> BatchFeature:
        import jax.numpy as jnp

        if not isinstance(images, (list, tuple)):
            images = [images]
        processed, sizes = [], []
        for im in images:
            arr = load_image(im)
            x = self._process_batch(jnp.asarray(arr)[None])[0]
            processed.append(np.asarray(x))
            sizes.append([x.shape[-2], x.shape[-1]])
        mh = max(p.shape[-2] for p in processed)
        mw = max(p.shape[-1] for p in processed)
        pixel_values = np.zeros((len(processed), 3, mh, mw), np.float32)
        for i, p in enumerate(processed):
            pixel_values[i, :, :p.shape[-2], :p.shape[-1]] = p
        image_sizes = np.asarray(sizes, np.int64)
        if return_tensors == "jax":
            pixel_values = jnp.asarray(pixel_values)
        return BatchFeature({"pixel_values": pixel_values,
                             "image_sizes": image_sizes})
