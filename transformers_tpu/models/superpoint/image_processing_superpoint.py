"""SuperPoint image processor (reference
models/superpoint/image_processing_superpoint.py): 480x640 resize, rescale
only, optional ITU-R 601-2 grayscale conversion."""

from __future__ import annotations

from ...image_processing_utils import BaseImageProcessor


class SuperPointImageProcessor(BaseImageProcessor):
    def __init__(self, **kwargs):
        kwargs.setdefault("size", {"height": 480, "width": 640})
        kwargs.setdefault("do_normalize", False)
        kwargs.setdefault("do_grayscale", False)
        super().__init__(**kwargs)

    def _process_batch(self, batch):
        x = super()._process_batch(batch)
        if self.do_grayscale:
            import jax.numpy as jnp

            # ITU-R 601-2 luma transform (reference convert_to_grayscale)
            coef = jnp.asarray([0.2989, 0.5870, 0.1140], x.dtype)
            gray = (x * coef[:, None, None]).sum(-3, keepdims=True)
            x = jnp.broadcast_to(gray, gray.shape[:-3] + (3,) + gray.shape[-2:])
        return x
