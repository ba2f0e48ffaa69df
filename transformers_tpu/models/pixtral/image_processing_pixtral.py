"""Pixtral image processor (reference
models/pixtral/image_processing_pixtral.py): scale each image down so its
longest edge fits ``size["longest_edge"]``, round dims UP to patch
multiples, CLIP-normalize -> per-image pixel_values (zero-padded to the
batch max) + image_sizes [n, 2] (the resized, pre-pad sizes)."""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ... import image_transforms as T
from ...image_processing_utils import (
    OPENAI_CLIP_MEAN,
    OPENAI_CLIP_STD,
    BaseImageProcessor,
    BatchFeature,
    load_image,
)


def _num_image_tokens(image_size, patch_size):
    """reference _num_image_tokens — ceil-div per axis."""
    height, width = image_size
    ph, pw = patch_size
    return (height - 1) // ph + 1, (width - 1) // pw + 1


def get_resize_output_size(height, width, size, patch_size):
    """reference get_resize_output_image_size — floor-scale into the
    longest-edge budget, then round up to patch multiples."""
    max_h, max_w = size if isinstance(size, (tuple, list)) else (size, size)
    ph, pw = patch_size
    ratio = max(height / max_h, width / max_w)
    if ratio > 1:
        height = int(math.floor(height / ratio))
        width = int(math.floor(width / ratio))
    nh, nw = _num_image_tokens((height, width), (ph, pw))
    return nh * ph, nw * pw


class PixtralImageProcessor(BaseImageProcessor):
    model_input_names = ["pixel_values", "image_sizes"]

    def __init__(self, size=None, patch_size=None, **kwargs):
        kwargs.setdefault("resample", "bicubic")
        kwargs.setdefault("image_mean", OPENAI_CLIP_MEAN)
        kwargs.setdefault("image_std", OPENAI_CLIP_STD)
        super().__init__(size=size or {"longest_edge": 1024}, **kwargs)
        patch_size = patch_size or {"height": 16, "width": 16}
        if isinstance(patch_size, int):
            patch_size = {"height": patch_size, "width": patch_size}
        self.patch_size = patch_size

    def preprocess(self, images, return_tensors="jax", patch_size=None,
                   **kwargs) -> BatchFeature:
        if not isinstance(images, (list, tuple)):
            images = [images]
        if patch_size is None:
            ps = (self.patch_size["height"], self.patch_size["width"])
        elif isinstance(patch_size, int):
            ps = (patch_size, patch_size)
        else:
            ps = (patch_size["height"], patch_size["width"])
        edge = self.size["longest_edge"]
        outs, sizes = [], []
        for image in images:
            arr = load_image(image).astype(np.float32)  # [C, H, W]
            h, w = arr.shape[-2:]
            if self.do_resize:
                th, tw = get_resize_output_size(h, w, edge, ps)
                arr = np.asarray(T.resize(jnp.asarray(arr), (th, tw),
                                          resample=self.resample))
            if self.do_rescale:
                arr = arr * self.rescale_factor
            if self.do_normalize:
                mean = np.asarray(self.image_mean, np.float32).reshape(-1, 1, 1)
                std = np.asarray(self.image_std, np.float32).reshape(-1, 1, 1)
                arr = (arr - mean) / std
            sizes.append(arr.shape[-2:])
            outs.append(arr)
        # zero-pad to the batch max (reference _pad_for_batching)
        mh = max(a.shape[-2] for a in outs)
        mw = max(a.shape[-1] for a in outs)
        outs = [np.pad(a, ((0, 0), (0, mh - a.shape[-2]), (0, mw - a.shape[-1])))
                for a in outs]
        pixel_values = np.stack(outs)
        if return_tensors == "jax":
            pixel_values = jnp.asarray(pixel_values)
        return BatchFeature({"pixel_values": pixel_values,
                             "image_sizes": np.asarray(sizes, np.int64)})
