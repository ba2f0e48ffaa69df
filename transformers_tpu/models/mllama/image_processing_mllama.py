"""Mllama image processor (reference
models/mllama/image_processing_mllama.py): pick the optimal tile canvas
(scale-preserving, least padding), aspect-resize into it, pad to the tile
grid, split into tiles -> pixel_values [B, max_imgs, max_tiles, C, S, S] +
aspect_ratio_ids / aspect_ratio_mask / num_tiles."""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ... import image_transforms as T
from ...image_processing_utils import (
    BaseImageProcessor,
    BatchFeature,
    load_image,
)


def get_all_supported_aspect_ratios(max_image_tiles: int):
    return [(w, h) for w in range(1, max_image_tiles + 1)
            for h in range(1, max_image_tiles + 1)
            if w * h <= max_image_tiles]


def get_optimal_tiled_canvas(image_height, image_width, max_image_tiles,
                             tile_size):
    """Smallest upscale (or least downscale), ties by least area."""
    arrangements = get_all_supported_aspect_ratios(max_image_tiles)
    canvas_sizes = np.array(arrangements) * tile_size
    target_heights, target_widths = canvas_sizes.T
    scale_h = target_heights / image_height
    scale_w = target_widths / image_width
    scales = np.where(scale_w > scale_h, scale_h, scale_w)
    up = scales[scales >= 1]
    selected = np.min(up) if len(up) > 0 else np.max(scales[scales < 1])
    chosen = canvas_sizes[scales == selected]
    if len(chosen) > 1:
        chosen = chosen[np.argmin(chosen[:, 0] * chosen[:, 1])][None]
    return chosen[0]


def get_image_size_fit_to_canvas(image_height, image_width, canvas_height,
                                 canvas_width, tile_size):
    target_width = int(np.clip(image_width, tile_size, canvas_width))
    target_height = int(np.clip(image_height, tile_size, canvas_height))
    scale_h = target_height / image_height
    scale_w = target_width / image_width
    if scale_w < scale_h:
        return min(math.floor(image_height * scale_w) or 1, target_height), target_width
    return target_height, min(math.floor(image_width * scale_h) or 1, target_width)


def split_to_tiles(image: np.ndarray, nth: int, ntw: int) -> np.ndarray:
    c, h, w = image.shape
    th, tw = h // nth, w // ntw
    x = image.reshape(c, nth, th, ntw, tw).transpose(1, 3, 0, 2, 4)
    return np.ascontiguousarray(x.reshape(nth * ntw, c, th, tw))


def convert_aspect_ratios_to_ids(aspect_ratios, max_image_tiles):
    """(w_tiles, h_tiles) -> 1-based index into the supported list; pad 0."""
    supported = get_all_supported_aspect_ratios(max_image_tiles)
    return [supported.index(tuple(ar)) + 1 for ar in aspect_ratios]


class MllamaImageProcessor(BaseImageProcessor):
    model_input_names = ["pixel_values", "num_tiles", "aspect_ratio_ids",
                         "aspect_ratio_mask"]

    def __init__(self, max_image_tiles: int = 4, **kwargs):
        kwargs.setdefault("size", {"height": 448, "width": 448})
        kwargs.setdefault("resample", "bilinear")
        super().__init__(**kwargs)
        self.max_image_tiles = max_image_tiles

    def preprocess(self, images, return_tensors="jax", **kwargs) -> BatchFeature:
        if not isinstance(images, (list, tuple)):
            images = [images]
        nested = isinstance(images[0], (list, tuple))
        images_list = images if nested else [[im] for im in images]
        tile = self.size["height"]

        batch_tiles, batch_ars = [], []
        for group in images_list:
            sample_tiles, sample_ars = [], []
            for image in group:
                arr = load_image(image).astype(np.float32)  # [C, H, W]
                h, w = arr.shape[-2:]
                ch, cw = get_optimal_tiled_canvas(h, w, self.max_image_tiles, tile)
                nth, ntw = ch // tile, cw // tile
                nh, nw = get_image_size_fit_to_canvas(h, w, ch, cw, tile)
                arr = np.asarray(T.resize(jnp.asarray(arr), (nh, nw),
                                          resample=self.resample))
                arr = np.pad(arr, ((0, 0), (0, nth * tile - nh),
                                   (0, ntw * tile - nw)))
                if self.do_rescale:
                    arr = arr * self.rescale_factor
                if self.do_normalize:
                    mean = np.asarray(self.image_mean, np.float32).reshape(-1, 1, 1)
                    std = np.asarray(self.image_std, np.float32).reshape(-1, 1, 1)
                    arr = (arr - mean) / std
                sample_tiles.append(split_to_tiles(arr, nth, ntw))
                # reference resize() returns (num_tiles_height, num_tiles_width)
                sample_ars.append((nth, ntw))
            batch_tiles.append(sample_tiles)
            batch_ars.append(sample_ars)

        max_imgs = max(len(s) for s in batch_tiles)
        mt = self.max_image_tiles
        b = len(batch_tiles)
        c = batch_tiles[0][0].shape[1]
        pixel_values = np.zeros((b, max_imgs, mt, c, tile, tile), np.float32)
        ar_ids = np.zeros((b, max_imgs), np.int64)
        ar_mask = np.zeros((b, max_imgs, mt), np.int64)
        num_tiles = []
        for i, (tiles_s, ars_s) in enumerate(zip(batch_tiles, batch_ars)):
            num_tiles.append([t.shape[0] for t in tiles_s])
            ids = convert_aspect_ratios_to_ids(ars_s, mt)
            for j, (tiles, aid) in enumerate(zip(tiles_s, ids)):
                pixel_values[i, j, :tiles.shape[0]] = tiles
                ar_ids[i, j] = aid
                ar_mask[i, j, :tiles.shape[0]] = 1
        out = pixel_values
        if return_tensors == "jax":
            out = jnp.asarray(out)
        return BatchFeature({"pixel_values": out, "aspect_ratio_ids": ar_ids,
                             "aspect_ratio_mask": ar_mask,
                             "num_tiles": num_tiles})
