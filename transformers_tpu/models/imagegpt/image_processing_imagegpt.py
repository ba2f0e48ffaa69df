"""ImageGPT image processor (reference
models/imagegpt/image_processing_imagegpt.py): 32x32 resize, normalize to
[-1, 1], then quantize each pixel to the nearest of 512 color clusters —
the model consumes cluster ids (``input_ids``), not pixels."""

from __future__ import annotations

import numpy as np

from ...image_processing_utils import BaseImageProcessor, BatchFeature, load_image
from ... import image_transforms as T


class ImageGPTImageProcessor(BaseImageProcessor):
    def __init__(self, clusters=None, **kwargs):
        kwargs.setdefault("size", {"height": 256, "width": 256})
        kwargs.setdefault("do_normalize", True)
        kwargs.setdefault("do_rescale", False)
        super().__init__(**kwargs)
        self.clusters = np.asarray(clusters, np.float32) if clusters is not None else None

    def preprocess(self, images, return_tensors="jax", **kwargs) -> BatchFeature:
        import jax.numpy as jnp

        if not isinstance(images, (list, tuple)):
            images = [images]
        ids_out = []
        for im in images:
            arr = load_image(im)  # [C, H, W] uint8
            x = T.pil_exact_resize(
                arr, (self.size["height"], self.size["width"]),
                {2: "bilinear", 3: "bicubic"}.get(self.resample, self.resample),
            ).astype(np.float32)
            if self.do_normalize:
                # reference normalize: x/127.5 - 1
                x = x / 127.5 - 1.0
            if self.clusters is None:
                ids_out.append(x)
                continue
            flat = x.transpose(1, 2, 0).reshape(-1, 3)  # [HW, 3]
            d = ((flat[:, None, :] - self.clusters[None]) ** 2).sum(-1)
            ids_out.append(d.argmin(-1).astype(np.int64))
        key = "input_ids" if self.clusters is not None else "pixel_values"
        out = np.stack(ids_out)
        if return_tensors == "jax":
            out = jnp.asarray(out)
        return BatchFeature({key: out})

    def to_dict(self):
        d = super().to_dict()
        if self.clusters is not None:
            d["clusters"] = self.clusters.tolist()
        return d
