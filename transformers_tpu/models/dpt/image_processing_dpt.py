"""DPT image processor (reference models/dpt/image_processing_dpt.py):
384x384 with ``keep_aspect_ratio`` (scale as little as possible, :94-101)
and ``ensure_multiple_of`` rounding (:76-85); optional pad to a multiple of
size_divisor; depth post-processing. Serves depth_anything (auto mapping)."""

from __future__ import annotations

import math

import numpy as np

from ...image_processing_utils import (
    IMAGENET_STANDARD_MEAN,
    IMAGENET_STANDARD_STD,
    BaseImageProcessor,
)
from ... import image_transforms as T


def _constrain(val: float, multiple: int, min_val: int = 0, max_val: int | None = None) -> int:
    x = round(val / multiple) * multiple
    if max_val is not None and x > max_val:
        x = math.floor(val / multiple) * multiple
    if x < min_val:
        x = math.ceil(val / multiple) * multiple
    return int(x)


class DPTImageProcessor(BaseImageProcessor):
    def __init__(self, **kwargs):
        kwargs.setdefault("size", {"height": 384, "width": 384})
        kwargs.setdefault("resample", "bicubic")
        kwargs.setdefault("keep_aspect_ratio", False)
        kwargs.setdefault("ensure_multiple_of", 1)
        kwargs.setdefault("do_pad", False)
        kwargs.setdefault("size_divisor", None)
        kwargs.setdefault("do_reduce_labels", False)
        kwargs.setdefault("image_mean", IMAGENET_STANDARD_MEAN)
        kwargs.setdefault("image_std", IMAGENET_STANDARD_STD)
        super().__init__(**kwargs)

    def resize_size(self, height: int, width: int) -> tuple[int, int]:
        oh, ow = self.size["height"], self.size["width"]
        sh, sw = oh / height, ow / width
        if self.keep_aspect_ratio:
            # scale as little as possible (reference :94-101)
            if abs(1 - sw) < abs(1 - sh):
                sh = sw
            else:
                sw = sh
        m = self.ensure_multiple_of or 1
        return (_constrain(sh * height, m), _constrain(sw * width, m))

    def _process_batch(self, batch):
        x = super()._process_batch(batch)
        if self.do_pad and self.size_divisor:
            h, w = x.shape[-2], x.shape[-1]
            ph = (self.size_divisor - h % self.size_divisor) % self.size_divisor
            pw = (self.size_divisor - w % self.size_divisor) % self.size_divisor
            import jax.numpy as jnp

            x = jnp.pad(x, [(0, 0)] * (x.ndim - 2)
                        + [(ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2)])
        return x

    def post_process_depth_estimation(self, outputs, target_sizes=None):
        """Predicted depth -> list of per-image maps resized to target sizes
        (reference post_process_depth_estimation)."""
        import jax.numpy as jnp

        depth = np.asarray(outputs.predicted_depth
                           if hasattr(outputs, "predicted_depth") else outputs)
        out = []
        for i in range(depth.shape[0]):
            d = depth[i]
            if target_sizes is not None:
                th, tw = target_sizes[i]
                d = np.asarray(T.resize(jnp.asarray(d)[None], (int(th), int(tw)),
                                        resample="bicubic", antialias=False))[0]
            out.append({"predicted_depth": d})
        return out
