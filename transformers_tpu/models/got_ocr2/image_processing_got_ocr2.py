"""GOT-OCR2 image processor (reference
models/got_ocr2/image_processing_got_ocr2.py): fixed 384x384 CLIP-stat
resize, with optional InternVL-style ``crop_to_patches`` — the image is
resized onto the tiled canvas whose grid aspect ratio best matches the
original, split into patch_size tiles, and a whole-image thumbnail appended
when more than one tile was produced. Also the image tier for InternVL and
Aya-Vision (reference internvl/aya_vision processors compose this class)."""

from __future__ import annotations

import numpy as np

from ...image_processing_utils import (
    OPENAI_CLIP_MEAN,
    OPENAI_CLIP_STD,
    BaseImageProcessor,
    BatchFeature,
    load_image,
)


def get_all_supported_aspect_ratios(min_tiles: int, max_tiles: int):
    """All (cols, rows) grids with min_tiles <= cols*rows <= max_tiles,
    sorted by tile count (reference get_all_supported_aspect_ratios)."""
    out = []
    for n in range(1, max_tiles + 1):
        for w in range(1, n + 1):
            if n % w == 0:
                h = n // w
                if min_tiles <= w * h <= max_tiles:
                    out.append((w, h))
    return sorted(set(out), key=lambda x: x[0] * x[1])


def get_optimal_tiled_canvas(orig_hw, patch_hw, min_tiles: int, max_tiles: int):
    """(cols, rows) of the grid whose aspect ratio is closest to the image's;
    ties go to the larger grid when the image has more than half the canvas
    area (reference get_optimal_tiled_canvas)."""
    oh, ow = orig_hw
    ph, pw = patch_hw
    aspect = ow / oh
    best, best_diff = (1, 1), float("inf")
    for grid in get_all_supported_aspect_ratios(min_tiles, max_tiles):
        diff = abs(aspect - grid[0] / grid[1])
        if diff < best_diff:
            best, best_diff = grid, diff
        elif diff == best_diff and ow * oh > 0.5 * ph * pw * grid[0] * grid[1]:
            best = grid
    return best


class GotOcr2ImageProcessor(BaseImageProcessor):
    def __init__(self, **kwargs):
        kwargs.setdefault("size", {"height": 384, "width": 384})
        kwargs.setdefault("resample", "bicubic")
        kwargs.setdefault("image_mean", OPENAI_CLIP_MEAN)
        kwargs.setdefault("image_std", OPENAI_CLIP_STD)
        self.crop_to_patches = kwargs.pop("crop_to_patches", False)
        self.min_patches = kwargs.pop("min_patches", 1)
        self.max_patches = kwargs.pop("max_patches", 12)
        self.use_thumbnail = kwargs.pop("use_thumbnail", True)
        super().__init__(**kwargs)

    def resize_size(self, height: int, width: int):
        return (self.size["height"], self.size["width"])

    def crop_image_to_patches(self, arr: np.ndarray, min_patches: int,
                              max_patches: int, use_thumbnail: bool = True):
        """[C, H, W] uint8 -> list of [C, ph, pw] crops (+ thumbnail)."""
        from PIL import Image

        ph, pw = self.size["height"], self.size["width"]
        cols, rows = get_optimal_tiled_canvas(arr.shape[-2:], (ph, pw),
                                              min_patches, max_patches)
        img = Image.fromarray(arr.transpose(1, 2, 0).astype(np.uint8))
        canvas = np.asarray(
            img.resize((pw * cols, ph * rows), Image.BICUBIC)).transpose(2, 0, 1)
        crops = []
        for i in range(cols * rows):
            c, r = i % cols, i // cols
            crops.append(canvas[:, r * ph:(r + 1) * ph, c * pw:(c + 1) * pw])
        if use_thumbnail and len(crops) != 1:
            crops.append(np.asarray(
                img.resize((pw, ph), Image.BICUBIC)).transpose(2, 0, 1))
        return crops

    def preprocess(self, images, return_tensors="jax", crop_to_patches=None,
                   min_patches=None, max_patches=None, **kwargs) -> BatchFeature:
        import jax.numpy as jnp

        if not isinstance(images, (list, tuple)):
            images = [images]
        crop = self.crop_to_patches if crop_to_patches is None else crop_to_patches
        pieces, num_patches = [], []
        for im in images:
            arr = load_image(im)
            if crop:
                crops = self.crop_image_to_patches(
                    arr, min_patches or self.min_patches,
                    max_patches or self.max_patches, self.use_thumbnail)
            else:
                crops = [arr]
            num_patches.append(len(crops))
            for cimg in crops:
                x = jnp.asarray(cimg)[None]
                pieces.append(np.asarray(self._process_batch(x)[0]))
        pixel_values = np.stack(pieces)
        if return_tensors == "jax":
            pixel_values = jnp.asarray(pixel_values)
        return BatchFeature({"pixel_values": pixel_values,
                             "num_patches": num_patches})
