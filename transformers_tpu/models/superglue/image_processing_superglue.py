"""SuperGlue image processor (reference
src/transformers/models/superglue/image_processing_superglue.py): per-image
resize to (480, 640), rescale, luminance grayscale (replicated to 3
channels); inputs are PAIRS of images -> pixel_values [B, 2, 3, H, W].
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ... import image_transforms as T
from ...image_processing_utils import BaseImageProcessor, BatchFeature, load_image


class SuperGlueImageProcessor(BaseImageProcessor):
    def __init__(self, **kwargs):
        kwargs.setdefault("size", {"height": 480, "width": 640})
        kwargs.setdefault("do_normalize", False)
        kwargs.setdefault("do_grayscale", True)
        super().__init__(**kwargs)

    def _one(self, image):
        arr = load_image(image)
        x = jnp.asarray(arr, jnp.float32)[None]
        if self.do_rescale:
            x = T.rescale(x, self.rescale_factor)
        if self.do_resize:
            x = T.resize(x, (self.size["height"], self.size["width"]), resample=self.resample)
        if getattr(self, "do_grayscale", True):
            luma = (0.2989 * x[:, 0] + 0.587 * x[:, 1] + 0.114 * x[:, 2])[:, None]
            x = jnp.concatenate([luma, luma, luma], axis=1)
        return x[0]

    def preprocess(self, images, return_tensors="jax", **kwargs) -> BatchFeature:
        # accept a flat [img0, img1] pair or a list of pairs
        if isinstance(images, (list, tuple)) and len(images) == 2 and not (
                isinstance(images[0], (list, tuple))):
            pairs = [images]
        else:
            pairs = list(images)
        batch = jnp.stack([jnp.stack([self._one(a), self._one(b)]) for a, b in pairs])
        if return_tensors in ("np", "numpy"):
            batch = np.asarray(batch)
        return BatchFeature({"pixel_values": batch})

    def post_process_keypoint_matching(self, outputs, target_sizes, threshold=0.0):
        """reference post_process_keypoint_matching: absolute matched
        keypoint pairs per image pair."""
        results = []
        keypoints = np.asarray(outputs.keypoints)          # [B, 2, K, 2] relative
        matches = np.asarray(outputs.matches)              # [B, 2, K]
        scores = np.asarray(outputs.matching_scores)       # [B, 2, K]
        masks = np.asarray(outputs.mask)                   # [B, 2, K]
        for i, pair_sizes in enumerate(target_sizes):
            (h0, w0), (h1, w1) = pair_sizes
            kp0 = keypoints[i, 0] * np.asarray([w0, h0])
            kp1 = keypoints[i, 1] * np.asarray([w1, h1])
            m0 = matches[i, 0]
            s0 = scores[i, 0]
            valid = (m0 > -1) & (masks[i, 0] > 0) & (s0 > threshold)
            idx = np.nonzero(valid)[0]
            results.append({
                "keypoints0": kp0[idx],
                "keypoints1": kp1[m0[idx]],
                "matching_scores": s0[idx],
            })
        return results
