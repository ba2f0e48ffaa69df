"""SAM image processor (reference src/transformers/models/sam/image_processing_sam.py).

Longest-edge resize (scale = longest_edge / max(h, w), sizes rounded with
+0.5), rescale + normalize, bottom/right pad to a square ``pad_size``.
``post_process_masks`` upsamples low-res mask logits to the padded size,
crops the reshaped region and resizes to the original image.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ... import image_transforms as T
from ...image_processing_utils import BaseImageProcessor, BatchFeature, load_image

IMAGENET_DEFAULT_MEAN = [0.485, 0.456, 0.406]
IMAGENET_DEFAULT_STD = [0.229, 0.224, 0.225]


def _target_size(h: int, w: int, longest_edge: int) -> tuple[int, int]:
    scale = longest_edge / max(h, w)
    return int(h * scale + 0.5), int(w * scale + 0.5)


class SamImageProcessor(BaseImageProcessor):
    def __init__(self, **kwargs):
        kwargs.setdefault("size", {"longest_edge": 1024})
        kwargs.setdefault("pad_size", {"height": 1024, "width": 1024})
        kwargs.setdefault("mask_size", {"longest_edge": 256})
        kwargs.setdefault("image_mean", IMAGENET_DEFAULT_MEAN)
        kwargs.setdefault("image_std", IMAGENET_DEFAULT_STD)
        kwargs.setdefault("do_pad", True)
        super().__init__(**kwargs)

    def preprocess(self, images, return_tensors="jax", **kwargs) -> BatchFeature:
        if not isinstance(images, (list, tuple)):
            images = [images]
        arrays = [load_image(im) for im in images]
        pixel, original_sizes, reshaped = [], [], []
        ph, pw = self.pad_size["height"], self.pad_size["width"]
        for arr in arrays:
            h, w = arr.shape[-2], arr.shape[-1]
            th, tw = _target_size(h, w, self.size["longest_edge"])
            x = jnp.asarray(arr, jnp.float32)[None]
            if self.do_rescale:
                x = T.rescale(x, self.rescale_factor)
            x = T.resize(x, (th, tw), resample=self.resample)
            if self.do_normalize:
                x = T.normalize(x, self.image_mean, self.image_std)
            if self.do_pad:
                x = jnp.pad(x, ((0, 0), (0, 0), (0, ph - th), (0, pw - tw)))
            pixel.append(x[0])
            original_sizes.append((h, w))
            reshaped.append((th, tw))
        pixel_values = jnp.stack(pixel)
        if return_tensors in ("np", "numpy"):
            pixel_values = np.asarray(pixel_values)
        return BatchFeature({"pixel_values": pixel_values,
                             "original_sizes": original_sizes,
                             "reshaped_input_sizes": reshaped})

    def post_process_masks(self, masks, original_sizes, reshaped_input_sizes,
                           mask_threshold=0.0, binarize=True):
        """masks: [B, pb, n, h, w] logits -> list of [pb, n, H, W] per image."""
        out = []
        ph, pw = self.pad_size["height"], self.pad_size["width"]
        masks = jnp.asarray(masks)
        for i, (orig, resh) in enumerate(zip(original_sizes, reshaped_input_sizes)):
            m = masks[i]  # [pb, n, h, w]
            pb, n, h, w = m.shape
            m = T.resize(m.reshape(pb * n, 1, h, w), (ph, pw), resample="bilinear",
                         antialias=False)
            m = m[:, :, : resh[0], : resh[1]]
            m = T.resize(m, tuple(orig), resample="bilinear", antialias=False)
            m = m.reshape(pb, n, *orig)
            out.append(m > mask_threshold if binarize else m)
        return out

    def scale_points(self, points, original_size):
        """Scale (x, y) point coords from the original image to the resized
        input frame."""
        th, tw = _target_size(original_size[0], original_size[1], self.size["longest_edge"])
        pts = np.asarray(points, np.float32).copy()
        pts[..., 0] = pts[..., 0] * (tw / original_size[1])
        pts[..., 1] = pts[..., 1] * (th / original_size[0])
        return pts
