"""Llama 4 processor (reference models/llama4/processing_llama4.py): images
tile onto an aspect-matched grid (GOT-OCR2-style canvas at 336px) plus a
global thumbnail; each ``<|image|>`` placeholder expands to
``<|image_start|>`` + per-tile ``<|patch|>`` runs with tile_x/tile_y
separators + ``<|image|>`` + global patches + ``<|image_end|>``."""

from __future__ import annotations

import math

from ...image_processing_utils import BatchFeature
from ...processing_utils import ProcessorMixin
from ..got_ocr2.image_processing_got_ocr2 import get_optimal_tiled_canvas


class Llama4Processor(ProcessorMixin):
    attributes = ["image_processor", "tokenizer"]

    def __init__(self, image_processor=None, tokenizer=None,
                 patch_size: int = 14, pixel_shuffle_ratio: float = 0.5,
                 fake_image_token: str = "<|image|>",
                 image_token: str = "<|image|>", **kwargs):
        super().__init__(image_processor=image_processor, tokenizer=tokenizer, **kwargs)
        self.patch_size = patch_size
        self.pixel_shuffle_ratio = pixel_shuffle_ratio
        self.fake_image_token = fake_image_token
        self.image_token = image_token

    def _num_patches_per_chunk(self, tile_hw: int) -> int:
        down = int(round(1.0 / (self.pixel_shuffle_ratio ** 2)))
        return (tile_hw // self.patch_size) ** 2 // down

    def _prompt_split_image(self, ratio_h: int, ratio_w: int, npc: int) -> str:
        s = "<|image_start|>"
        if ratio_h * ratio_w > 1:
            for _yy in range(ratio_h):
                for xx in range(ratio_w):
                    s += "<|patch|>" * npc
                    if xx < ratio_w - 1:
                        s += "<|tile_x_separator|>"
                s += "<|tile_y_separator|>"
        s += "<|image|>" + "<|patch|>" * npc + "<|image_end|>"
        return s

    def __call__(self, text=None, images=None, return_tensors="jax",
                 padding=True, **kwargs) -> BatchFeature:
        data: dict = {}
        if isinstance(text, str):
            text = [text]
        reps: list[str] = []
        if images is not None:
            if not isinstance(images, (list, tuple)):
                images = [images]
            img = self.image_processor(images, return_tensors=return_tensors,
                                       crop_to_patches=True)
            num_patches = list(img.pop("num_patches", [1] * len(images)))
            data.update(img)
            tile = self.image_processor.size["height"]
            npc = self._num_patches_per_chunk(tile)
            for im, n in zip(images, num_patches):
                import numpy as np

                arr = np.asarray(im)
                n_tiles = int(n) - 1 if int(n) > 1 else 1  # thumbnail excluded
                cols, rows = get_optimal_tiled_canvas(
                    arr.shape[:2], (tile, tile), 1,
                    getattr(self.image_processor, "max_patches", 12)) \
                    if n_tiles > 1 else (1, 1)
                reps.append(self._prompt_split_image(rows, cols, npc)
                            if n_tiles > 1 else
                            "<|image_start|><|image|>" + "<|patch|>" * npc
                            + "<|image_end|>")
        if text is not None:
            if reps:
                text = self.expand_mm_tokens(text, {self.fake_image_token: reps})
            data.update(self.tokenizer(text, return_tensors=return_tensors,
                                       padding=padding,
                                       **{k: v for k, v in kwargs.items()
                                          if k in ("truncation", "max_length",
                                                   "add_special_tokens")}))
        return BatchFeature(data)
