"""Idefics2 image processor (reference
models/idefics2/image_processing_idefics2.py): aspect-preserving resize to
shortest 378 / longest 980, optional 2x2+original image splitting, batch
padded to the largest sub-image with a pixel_attention_mask. Output is
[B, N_subimages, C, H, W]."""

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


class Idefics2ImageProcessor(BaseImageProcessor):
    def __init__(self, **kwargs):
        kwargs.setdefault("size", {"shortest_edge": 378, "longest_edge": 980})
        kwargs.setdefault("resample", "bilinear")
        kwargs.setdefault("image_mean", IMAGENET_STANDARD_MEAN)
        kwargs.setdefault("image_std", IMAGENET_STANDARD_STD)
        self.do_image_splitting = kwargs.pop("do_image_splitting", False)
        self.do_pad = kwargs.pop("do_pad", True)
        super().__init__(**kwargs)

    def resize_size(self, height: int, width: int):
        return T.get_resize_output_size(
            height, width, self.size["shortest_edge"],
            longest_edge=self.size["longest_edge"])

    def _split(self, arr: np.ndarray):
        """[C, H, W] -> 4 quadrants + the original (reference
        split_image)."""
        h, w = arr.shape[-2:]
        mh, mw = h // 2, w // 2
        return [arr[:, :mh, :mw], arr[:, :mh, mw:], arr[:, mh:, :mw],
                arr[:, mh:, mw:], arr]

    def preprocess(self, images, return_tensors="jax", **kwargs) -> BatchFeature:
        import jax.numpy as jnp

        if not isinstance(images, (list, tuple)):
            images = [images]
        if images and not isinstance(images[0], (list, tuple)):
            images = [[im] for im in images]
        per_sample = []
        for group in images:
            subs = []
            for im in group:
                arr = load_image(im)
                pieces = self._split(arr) if self.do_image_splitting else [arr]
                for p in pieces:
                    x = jnp.asarray(p)[None]
                    subs.append(np.asarray(self._process_batch(x)[0]))
            per_sample.append(subs)
        n = max(len(s) for s in per_sample)
        mh = max(p.shape[-2] for s in per_sample for p in s)
        mw = max(p.shape[-1] for s in per_sample for p in s)
        b = len(per_sample)
        pixel_values = np.zeros((b, n, 3, mh, mw), np.float32)
        mask = np.zeros((b, n, mh, mw), np.int64)
        for i, subs in enumerate(per_sample):
            for j, p in enumerate(subs):
                pixel_values[i, j, :, :p.shape[-2], :p.shape[-1]] = p
                mask[i, j, :p.shape[-2], :p.shape[-1]] = 1
        if return_tensors == "jax":
            pixel_values = jnp.asarray(pixel_values)
            mask = jnp.asarray(mask)
        return BatchFeature({"pixel_values": pixel_values,
                             "pixel_attention_mask": mask})
