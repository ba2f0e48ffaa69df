"""ViLT image processor (reference models/vilt/image_processing_vilt.py):
shortest-edge 384 with longest edge capped at shortest*1333/800, both floored
to size_divisor 32; batch padded to the max size with a pixel_mask."""

from __future__ import annotations

import numpy as np

from ...image_processing_utils import (
    IMAGENET_STANDARD_MEAN,
    IMAGENET_STANDARD_STD,
    BaseImageProcessor,
    BatchFeature,
    load_image,
)
from ... import image_transforms as T


class ViltImageProcessor(BaseImageProcessor):
    def __init__(self, **kwargs):
        kwargs.setdefault("size", {"shortest_edge": 384})
        kwargs.setdefault("resample", "bicubic")
        kwargs.setdefault("size_divisor", 32)
        kwargs.setdefault("do_pad", True)
        kwargs.setdefault("image_mean", IMAGENET_STANDARD_MEAN)
        kwargs.setdefault("image_std", IMAGENET_STANDARD_STD)
        super().__init__(**kwargs)

    def resize_size(self, height: int, width: int) -> tuple[int, int]:
        shorter = self.size["shortest_edge"]
        longer = int(shorter * 1333 / 800)
        h, w = T.get_resize_output_size(height, width, shorter, longest_edge=longer)
        d = self.size_divisor
        return (max(d, (h // d) * d), max(d, (w // d) * d))

    def preprocess(self, images, return_tensors="jax", pil_exact: bool = False,
                   **kwargs) -> BatchFeature:
        import jax.numpy as jnp

        if not isinstance(images, (list, tuple)):
            images = [images]
        processed = []
        for im in images:
            arr = load_image(im)
            if pil_exact:
                processed.append(self._process_exact(arr))
            else:
                x = jnp.asarray(arr)[None]
                x = self._process_batch(x)[0]
                processed.append(np.asarray(x))
        if not self.do_pad:
            pixel_values = np.stack(processed)
            mask = np.ones(pixel_values.shape[:1] + pixel_values.shape[-2:], np.int64)
        else:
            mh = max(p.shape[-2] for p in processed)
            mw = max(p.shape[-1] for p in processed)
            pixel_values = np.zeros((len(processed), processed[0].shape[0], mh, mw),
                                    np.float32)
            mask = np.zeros((len(processed), mh, mw), np.int64)
            for i, p in enumerate(processed):
                pixel_values[i, :, :p.shape[-2], :p.shape[-1]] = p
                mask[i, :p.shape[-2], :p.shape[-1]] = 1
        if return_tensors == "jax":
            pixel_values = jnp.asarray(pixel_values)
            mask = jnp.asarray(mask)
        return BatchFeature({"pixel_values": pixel_values, "pixel_mask": mask})
