"""VideoMAE image processor (reference
models/videomae/image_processing_videomae.py): per-frame shortest-edge 224
resize + 224 crop over [T, C, H, W] videos. Serves TimeSformer; ViViT uses
the same geometry with 1/127.5-offset rescale."""

from __future__ import annotations

import numpy as np

from ...image_processing_utils import (
    IMAGENET_STANDARD_MEAN,
    IMAGENET_STANDARD_STD,
    BaseImageProcessor,
    BatchFeature,
    load_image,
)


class VideoMAEImageProcessor(BaseImageProcessor):
    def __init__(self, **kwargs):
        kwargs.setdefault("size", {"shortest_edge": 224})
        kwargs.setdefault("do_center_crop", True)
        kwargs.setdefault("crop_size", {"height": 224, "width": 224})
        kwargs.setdefault("image_mean", IMAGENET_STANDARD_MEAN)
        kwargs.setdefault("image_std", IMAGENET_STANDARD_STD)
        super().__init__(**kwargs)

    def preprocess(self, videos, return_tensors="jax", **kwargs) -> BatchFeature:
        """videos: one or a list of [T, H, W, C]/[T, C, H, W] arrays or lists
        of frames; output pixel_values [B, T, C, H, W]."""
        import jax.numpy as jnp

        if not isinstance(videos, (list, tuple)) or (
                isinstance(videos, (list, tuple)) and np.asarray(videos[0]).ndim <= 3
                and not isinstance(videos[0], (list, tuple))):
            videos = [videos]
        out = []
        for video in videos:
            frames = [load_image(f) for f in (video if isinstance(video, (list, tuple))
                                              else list(np.asarray(video)))]
            feat = super().preprocess(frames, return_tensors="jax", **kwargs)
            out.append(feat["pixel_values"])
        pixel_values = jnp.stack(out)
        if return_tensors in ("np", "numpy"):
            pixel_values = np.asarray(pixel_values)
        return BatchFeature({"pixel_values": pixel_values})


class VivitImageProcessor(VideoMAEImageProcessor):
    """reference models/vivit/image_processing_vivit.py: adds offset rescale
    (1/127.5 with -1 shift to land in [-1, 1])."""

    def __init__(self, **kwargs):
        kwargs.setdefault("rescale_factor", 1 / 127.5)
        kwargs.setdefault("offset", True)
        super().__init__(**kwargs)

    def _process_batch(self, batch):
        import jax.numpy as jnp

        from ... import image_transforms as T

        x = batch.astype(jnp.float32)
        if self.do_rescale:
            x = x * self.rescale_factor
            if self.offset:
                x = x - 1
        if self.do_resize:
            h, w = x.shape[-2], x.shape[-1]
            x = T.resize(x, self.resize_size(h, w), resample=self.resample)
        if self.do_center_crop and self.crop_size:
            x = T.center_crop(x, (self.crop_size["height"], self.crop_size["width"]))
        if self.do_normalize:
            x = T.normalize(x, self.image_mean, self.image_std)
        return x
