"""LLaVA-NeXT "anyres" image processor (reference
models/llava_next/image_processing_llava_next.py:40): pick the best grid
resolution for each image, aspect-resize + center-pad into it, cut into
crop-size patches, and prepend a downsampled full view -> pixel_values
[n_images, n_patches, C, H, W] (padded across the batch) + image_sizes
[n, 2] (original sizes, consumed by the model's unpadding)."""

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


def select_best_resolution(original_size, possible_resolutions):
    """reference image_processing_utils.py:633 — maximize effective
    resolution, break ties by least waste."""
    oh, ow = original_size
    best_fit, max_eff, min_waste = None, 0, float("inf")
    for height, width in possible_resolutions:
        scale = min(width / ow, height / oh)
        dw, dh = int(ow * scale), int(oh * scale)
        eff = min(dw * dh, ow * oh)
        waste = width * height - eff
        if eff > max_eff or (eff == max_eff and waste < min_waste):
            max_eff, min_waste = eff, waste
            best_fit = (height, width)
    return best_fit


def get_patch_output_size(oh, ow, target_resolution):
    """reference image_processing_utils.py:671."""
    th, tw = target_resolution
    scale_w, scale_h = tw / ow, th / oh
    if scale_w < scale_h:
        return min(math.ceil(oh * scale_w), th), tw
    return th, min(math.ceil(ow * scale_h), tw)


def divide_to_patches(image: np.ndarray, patch_size: int):
    """image [C, H, W] -> row-major list of [C, p, p] patches
    (reference image_transforms.py:839)."""
    h, w = image.shape[-2:]
    return [image[..., i:i + patch_size, j:j + patch_size]
            for i in range(0, h, patch_size)
            for j in range(0, w, patch_size)]


class LlavaNextImageProcessor(BaseImageProcessor):
    model_input_names = ["pixel_values", "image_sizes"]

    def __init__(self, image_grid_pinpoints=None, do_pad: bool = True, **kwargs):
        kwargs.setdefault("size", {"shortest_edge": 224})
        kwargs.setdefault("crop_size", {"height": 224, "width": 224})
        kwargs.setdefault("resample", "bicubic")
        kwargs.setdefault("do_center_crop", True)
        kwargs.setdefault("image_mean", OPENAI_CLIP_MEAN)
        kwargs.setdefault("image_std", OPENAI_CLIP_STD)
        super().__init__(**kwargs)
        self.image_grid_pinpoints = image_grid_pinpoints or [
            [336, 672], [672, 336], [672, 672], [1008, 336], [336, 1008]]
        self.do_pad = do_pad

    def _normalize_piece(self, piece: np.ndarray) -> np.ndarray:
        if self.do_rescale:
            piece = piece * self.rescale_factor
        if self.do_normalize:
            mean = np.asarray(self.image_mean, np.float32).reshape(-1, 1, 1)
            std = np.asarray(self.image_std, np.float32).reshape(-1, 1, 1)
            piece = (piece - mean) / std
        return piece

    def _get_image_patches(self, arr: np.ndarray):
        """arr [C, H, W] float -> [full view] + grid pieces, cut at
        crop_size granularity (reference _get_image_patches :101). Pieces
        are NOT uniform yet — preprocess resizes+crops each to crop_size."""
        size = self.size
        if "height" in size:
            size_tuple = (size["height"], size["width"])
        else:
            size_tuple = (size["shortest_edge"], size["shortest_edge"])
        patch = self.crop_size["height"] if self.crop_size else size_tuple[0]
        oh, ow = arr.shape[-2:]
        best = select_best_resolution((oh, ow), self.image_grid_pinpoints)
        nh, nw = get_patch_output_size(oh, ow, best)
        resized = np.asarray(T.resize(jnp.asarray(arr), (nh, nw),
                                      resample=self.resample))
        # center-pad into the best grid resolution (reference _pad_for_patching)
        pad_y, r_y = divmod(best[0] - nh, 2)
        pad_x, r_x = divmod(best[1] - nw, 2)
        padded = np.pad(resized, ((0, 0), (pad_y, pad_y + r_y),
                                  (pad_x, pad_x + r_x)))
        patches = divide_to_patches(padded, patch)
        full = np.asarray(T.resize(jnp.asarray(arr), size_tuple,
                                   resample=self.resample))
        return [full] + patches

    def _finalize_piece(self, piece: np.ndarray) -> np.ndarray:
        """Shortest-edge resize + center crop + rescale/normalize — the
        reference applies the standard pipeline to EVERY patch."""
        if self.do_resize:
            th, tw = self.resize_size(*piece.shape[-2:])
            piece = np.asarray(T.resize(jnp.asarray(piece), (th, tw),
                                        resample=self.resample))
        if self.do_center_crop and self.crop_size:
            piece = np.asarray(T.center_crop(
                jnp.asarray(piece)[None],
                (self.crop_size["height"], self.crop_size["width"])))[0]
        return self._normalize_piece(piece)

    def preprocess(self, images, return_tensors="jax", **kwargs) -> BatchFeature:
        if not isinstance(images, (list, tuple)):
            images = [images]
        per_image, sizes = [], []
        for image in images:
            arr = load_image(image).astype(np.float32)  # [C, H, W]
            sizes.append(arr.shape[-2:])
            pieces = [self._finalize_piece(p) for p in self._get_image_patches(arr)]
            per_image.append(np.stack(pieces))
        if self.do_pad:
            max_patches = max(p.shape[0] for p in per_image)
            per_image = [np.concatenate(
                [p, np.zeros((max_patches - p.shape[0], *p.shape[1:]), p.dtype)])
                if p.shape[0] < max_patches else p for p in per_image]
        pixel_values = np.stack(per_image)
        if return_tensors == "jax":
            pixel_values = jnp.asarray(pixel_values)
        return BatchFeature({"pixel_values": pixel_values,
                             "image_sizes": np.asarray(sizes, np.int64)})
