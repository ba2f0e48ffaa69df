"""ViTMatte image processor (reference
models/vitmatte/image_processing_vitmatte.py): rescale + ImageNet normalize
the image, append the (rescaled) trimap as a 4th channel, pad bottom/right
to size_divisibility 32."""

from __future__ import annotations

import numpy as np

from ...image_processing_utils import (
    IMAGENET_STANDARD_MEAN,
    IMAGENET_STANDARD_STD,
    BaseImageProcessor,
    BatchFeature,
    load_image,
)


class VitMatteImageProcessor(BaseImageProcessor):
    def __init__(self, **kwargs):
        kwargs.setdefault("do_resize", False)
        kwargs.setdefault("image_mean", IMAGENET_STANDARD_MEAN)
        kwargs.setdefault("image_std", IMAGENET_STANDARD_STD)
        self.size_divisor = kwargs.pop("size_divisibility",
                                       kwargs.pop("size_divisor", 32))
        super().__init__(**kwargs)

    def preprocess(self, images, trimaps=None, return_tensors="np",
                   **kwargs) -> BatchFeature:
        if trimaps is None:
            raise ValueError("ViTMatte requires `trimaps`.")
        if not isinstance(images, (list, tuple)):
            images = [images]
            trimaps = [trimaps]
        out = []
        mean = np.asarray(self.image_mean, np.float32)[:, None, None]
        std = np.asarray(self.image_std, np.float32)[:, None, None]
        for im, tri in zip(images, trimaps):
            arr = load_image(im).astype(np.float32) * self.rescale_factor
            arr = (arr - mean) / std
            tri = np.asarray(tri, np.float32)
            if tri.ndim == 2:
                tri = tri[None]
            tri = tri * self.rescale_factor
            x = np.concatenate([arr, tri], axis=0)  # [4, H, W]
            d = self.size_divisor
            h, w = x.shape[-2:]
            ph = 0 if h % d == 0 else d - h % d
            pw = 0 if w % d == 0 else d - w % d
            if ph or pw:
                x = np.pad(x, ((0, 0), (0, ph), (0, pw)))
            out.append(x)
        mh = max(x.shape[-2] for x in out)
        mw = max(x.shape[-1] for x in out)
        pixel_values = np.zeros((len(out), 4, mh, mw), np.float32)
        for i, x in enumerate(out):
            pixel_values[i, :, :x.shape[-2], :x.shape[-1]] = x
        if return_tensors == "jax":
            import jax.numpy as jnp

            pixel_values = jnp.asarray(pixel_values)
        return BatchFeature({"pixel_values": pixel_values})
