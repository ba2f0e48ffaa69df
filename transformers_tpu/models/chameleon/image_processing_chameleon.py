"""Chameleon image processor (reference
models/chameleon/image_processing_chameleon.py): shortest-edge 512 LANCZOS
resize, 512 crop, 0.0078 rescale with mean/std 1.0 (maps to [-1, 1])."""

from __future__ import annotations

from ...image_processing_utils import BaseImageProcessor


class ChameleonImageProcessor(BaseImageProcessor):
    def __init__(self, **kwargs):
        kwargs.setdefault("size", {"shortest_edge": 512})
        kwargs.setdefault("resample", "lanczos")
        kwargs.setdefault("do_center_crop", True)
        kwargs.setdefault("crop_size", {"height": 512, "width": 512})
        kwargs.setdefault("rescale_factor", 0.0078)
        kwargs.setdefault("image_mean", [1.0, 1.0, 1.0])
        kwargs.setdefault("image_std", [1.0, 1.0, 1.0])
        super().__init__(**kwargs)
