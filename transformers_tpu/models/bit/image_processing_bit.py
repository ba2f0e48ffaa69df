"""BiT image processor (reference models/bit/image_processing_bit.py):
shortest-edge 224 bicubic + 224 crop with OpenAI-CLIP statistics. Serves
dinov2/focalnet/hiera via the auto mapping."""

from __future__ import annotations

from ...image_processing_utils import (
    OPENAI_CLIP_MEAN,
    OPENAI_CLIP_STD,
    BaseImageProcessor,
)


class BitImageProcessor(BaseImageProcessor):
    def __init__(self, **kwargs):
        kwargs.setdefault("size", {"shortest_edge": 224})
        kwargs.setdefault("resample", "bicubic")
        kwargs.setdefault("do_center_crop", True)
        kwargs.setdefault("crop_size", {"height": 224, "width": 224})
        kwargs.setdefault("image_mean", OPENAI_CLIP_MEAN)
        kwargs.setdefault("image_std", OPENAI_CLIP_STD)
        super().__init__(**kwargs)
