"""Fuyu image processor (reference models/fuyu/image_processing_fuyu.py):
scale-to-fit inside target 1080x1920 (never upscale), pad bottom/right to
patch multiples, normalize at 0.5/0.5, and patchify into raster-order
patch_size x patch_size flattened patches — the model consumes raw patches
(no conv stem)."""

from __future__ import annotations

import math

import numpy as np

from ...image_processing_utils import (
    BaseImageProcessor,
    BatchFeature,
    load_image,
)


class FuyuImageProcessor(BaseImageProcessor):
    def __init__(self, **kwargs):
        kwargs.setdefault("size", {"height": 1080, "width": 1920})
        kwargs.setdefault("resample", "bilinear")
        kwargs.setdefault("image_mean", [0.5, 0.5, 0.5])
        kwargs.setdefault("image_std", [0.5, 0.5, 0.5])
        self.patch_size = kwargs.pop("patch_size", 30)
        super().__init__(**kwargs)

    def resize_size(self, height: int, width: int):
        th, tw = self.size["height"], self.size["width"]
        if height <= th and width <= tw:
            return (height, width)
        scale = min(th / height, tw / width)
        return (int(height * scale), int(width * scale))

    def patchify(self, arr: np.ndarray) -> np.ndarray:
        """[C, H, W] -> [n_patches, C*p*p] raster order (reference
        patchify_image)."""
        c, h, w = arr.shape
        p = self.patch_size
        x = arr.reshape(c, h // p, p, w // p, p)
        x = x.transpose(1, 3, 0, 2, 4).reshape((h // p) * (w // p), c * p * p)
        return x

    def preprocess(self, images, return_tensors="jax", **kwargs) -> BatchFeature:
        import jax.numpy as jnp

        if not isinstance(images, (list, tuple)):
            images = [images]
        patches, dims = [], []
        p = self.patch_size
        for im in images:
            arr = load_image(im)
            x = np.asarray(self._process_batch(jnp.asarray(arr)[None])[0])
            c, h, w = x.shape
            ph = math.ceil(h / p) * p
            pw = math.ceil(w / p) * p
            if (ph, pw) != (h, w):
                full = np.ones((c, ph, pw), np.float32)
                full[:, :h, :w] = x
                x = full
            patches.append(self.patchify(x))
            dims.append((ph // p, pw // p))
        n = max(pt.shape[0] for pt in patches)
        out = np.zeros((len(patches), n, patches[0].shape[1]), np.float32)
        for i, pt in enumerate(patches):
            out[i, :pt.shape[0]] = pt
        if return_tensors == "jax":
            out = jnp.asarray(out)
        return BatchFeature({"image_patches": out,
                             "image_patch_dims": np.asarray(dims, np.int64)})
