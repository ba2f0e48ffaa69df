"""Pix2Struct image processor (reference
models/pix2struct/image_processing_pix2struct.py): per-image
standardization, aspect-preserving scale to the feasible patch grid under
``max_patches``, 16x16 patch extraction, and [row+1, col+1, patch] rows
padded to max_patches with an attention mask."""

from __future__ import annotations

import math

import numpy as np

from ...image_processing_utils import (
    BaseImageProcessor,
    BatchFeature,
    load_image,
)


class Pix2StructImageProcessor(BaseImageProcessor):
    def __init__(self, **kwargs):
        self.max_patches = kwargs.pop("max_patches", 2048)
        self.patch_size = kwargs.pop("patch_size",
                                     {"height": 16, "width": 16})
        self.do_convert_rgb = kwargs.pop("do_convert_rgb", True)
        kwargs.setdefault("do_normalize", True)
        super().__init__(**kwargs)

    def extract_flattened_patches(self, arr: np.ndarray, max_patches: int):
        """[C, H, W] float -> ([max_patches, 2 + C*ph*pw], mask)."""
        from PIL import Image

        ph, pw = self.patch_size["height"], self.patch_size["width"]
        c, h, w = arr.shape
        scale = math.sqrt(max_patches * (ph / h) * (pw / w))
        rows = max(min(int(scale * h / ph), max_patches), 1)
        cols = max(min(int(scale * w / pw), max_patches), 1)
        rh, rw = max(rows * ph, 1), max(cols * pw, 1)
        # bilinear resize in float (antialiased, matching torchvision)
        chans = [np.asarray(Image.fromarray(ch).resize((rw, rh), Image.BILINEAR))
                 for ch in arr]
        x = np.stack(chans)  # [C, rh, rw]
        # reference torch_extract_patches flattens each patch as
        # (ph, pw, c) — channel fastest (permute(0, 4, 2, 3, 1))
        x = x.reshape(c, rows, ph, cols, pw).transpose(1, 3, 2, 4, 0)
        patches = x.reshape(rows * cols, ph * pw * c)
        row_ids = np.repeat(np.arange(rows), cols)[:, None] + 1
        col_ids = np.tile(np.arange(cols), rows)[:, None] + 1
        flat = np.concatenate([row_ids, col_ids, patches], axis=1).astype(np.float32)
        out = np.zeros((max_patches, flat.shape[1]), np.float32)
        n = min(flat.shape[0], max_patches)
        out[:n] = flat[:n]
        mask = np.zeros((max_patches,), np.int64)
        mask[:n] = 1
        return out, mask

    def preprocess(self, images, return_tensors="np", max_patches=None,
                   **kwargs) -> BatchFeature:
        if not isinstance(images, (list, tuple)):
            images = [images]
        max_patches = max_patches or self.max_patches
        feats, masks = [], []
        for im in images:
            arr = load_image(im).astype(np.float32)
            if self.do_normalize:
                # per-image standardization (reference normalize: adjusted
                # std guards constant images)
                std = max(float(arr.std()), 1.0 / math.sqrt(arr.size))
                arr = (arr - arr.mean()) / std
            f, m = self.extract_flattened_patches(arr, max_patches)
            feats.append(f)
            masks.append(m)
        data = {"flattened_patches": np.stack(feats),
                "attention_mask": np.stack(masks)}
        if return_tensors == "jax":
            import jax.numpy as jnp

            data = {k: jnp.asarray(v) for k, v in data.items()}
        return BatchFeature(data)
