"""Qwen2-VL image processor (reference
models/qwen2_vl/image_processing_qwen2_vl.py): dynamic-resolution
``smart_resize`` to multiples of patch*merge, CLIP normalization, then
merge-block-ordered patch flattening -> (pixel_values [N, C*T*P*P],
image_grid_thw [n, 3])."""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ...image_processing_utils import (
    OPENAI_CLIP_MEAN,
    OPENAI_CLIP_STD,
    BaseImageProcessor,
    BatchFeature,
    load_image,
)
from ... import image_transforms as T


def smart_resize(height: int, width: int, factor: int = 28,
                 min_pixels: int = 56 * 56, max_pixels: int = 14 * 14 * 4 * 1280):
    """reference image_processing_qwen2_vl.py smart_resize (same numerics)."""
    if max(height, width) / min(height, width) > 200:
        raise ValueError("absolute aspect ratio must be smaller than 200")
    h_bar = round(height / factor) * factor
    w_bar = round(width / factor) * factor
    if h_bar * w_bar > max_pixels:
        beta = math.sqrt((height * width) / max_pixels)
        h_bar = max(factor, math.floor(height / beta / factor) * factor)
        w_bar = max(factor, math.floor(width / beta / factor) * factor)
    elif h_bar * w_bar < min_pixels:
        beta = math.sqrt(min_pixels / (height * width))
        h_bar = math.ceil(height * beta / factor) * factor
        w_bar = math.ceil(width * beta / factor) * factor
    return h_bar, w_bar


class Qwen2VLImageProcessor(BaseImageProcessor):
    def __init__(self, patch_size=14, temporal_patch_size=2, merge_size=2,
                 min_pixels=56 * 56, max_pixels=14 * 14 * 4 * 1280, **kwargs):
        kwargs.setdefault("image_mean", OPENAI_CLIP_MEAN)
        kwargs.setdefault("image_std", OPENAI_CLIP_STD)
        kwargs.setdefault("resample", "bicubic")
        super().__init__(**kwargs)
        self.patch_size = patch_size
        self.temporal_patch_size = temporal_patch_size
        self.merge_size = merge_size
        self.min_pixels = min_pixels
        self.max_pixels = max_pixels

    def _flatten(self, frames: np.ndarray, gh: int, gw: int):
        """frames [T, C, H, W] float -> ([grid_t*gh*gw, C*tps*p*p], grid_t)."""
        p, tps, m = self.patch_size, self.temporal_patch_size, self.merge_size
        if frames.shape[0] % tps != 0:
            reps = np.repeat(frames[-1:], tps - frames.shape[0] % tps, axis=0)
            frames = np.concatenate([frames, reps], axis=0)
        grid_t = frames.shape[0] // tps
        c = frames.shape[1]
        x = frames.reshape(grid_t, tps, c, gh // m, m, p, gw // m, m, p)
        x = x.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
        return x.reshape(grid_t * gh * gw, c * tps * p * p), grid_t

    def preprocess(self, images, return_tensors="jax", **kwargs) -> BatchFeature:
        if not isinstance(images, (list, tuple)):
            images = [images]
        factor = self.patch_size * self.merge_size
        all_patches = []
        grids = []
        for image in images:
            arr = load_image(image).astype(np.float32)  # [C, H, W]
            if self.do_rescale:
                arr = arr * self.rescale_factor
            h, w = arr.shape[-2:]
            rh, rw = smart_resize(h, w, factor, self.min_pixels, self.max_pixels)
            resized = np.asarray(T.resize(jnp.asarray(arr), (rh, rw), resample=self.resample))
            if self.do_normalize:
                mean = np.asarray(self.image_mean, np.float32).reshape(-1, 1, 1)
                std = np.asarray(self.image_std, np.float32).reshape(-1, 1, 1)
                resized = (resized - mean) / std
            gh, gw = rh // self.patch_size, rw // self.patch_size
            flat, grid_t = self._flatten(resized[None], gh, gw)
            all_patches.append(flat)
            grids.append((grid_t, gh, gw))
        pixel_values = np.concatenate(all_patches, axis=0)
        grid_thw = np.asarray(grids, np.int64)
        if return_tensors == "jax":
            pixel_values = jnp.asarray(pixel_values)
        return BatchFeature({"pixel_values": pixel_values, "image_grid_thw": grid_thw})
