"""VideoMAE / TimeSformer video processors (reference
models/videomae/video_processing_videomae.py): shortest-edge 224 resize +
224 center crop, ImageNet stats, per-frame."""

from __future__ import annotations

from ... import image_transforms as T
from ...image_processing_utils import (
    IMAGENET_STANDARD_MEAN,
    IMAGENET_STANDARD_STD,
)
from ...video_processing_utils import BaseVideoProcessor


class VideoMAEVideoProcessor(BaseVideoProcessor):
    def __init__(self, **kwargs):
        kwargs.setdefault("size", {"shortest_edge": 224})
        kwargs.setdefault("resample", "bilinear")
        kwargs.setdefault("do_center_crop", True)
        kwargs.setdefault("crop_size", {"height": 224, "width": 224})
        kwargs.setdefault("image_mean", IMAGENET_STANDARD_MEAN)
        kwargs.setdefault("image_std", IMAGENET_STANDARD_STD)
        super().__init__(**kwargs)

    def resize_size(self, height: int, width: int):
        return T.get_resize_output_size(height, width, self.size["shortest_edge"])


class TimesformerVideoProcessor(VideoMAEVideoProcessor):
    pass


class VivitVideoProcessor(VideoMAEVideoProcessor):
    """reference models/vivit/video_processing_vivit.py: 256 shortest edge,
    224 crop, offset rescale to [-1, 1]."""

    def __init__(self, **kwargs):
        kwargs.setdefault("size", {"shortest_edge": 256})
        kwargs.setdefault("rescale_factor", 1 / 127.5)
        kwargs.setdefault("offset", True)
        super().__init__(**kwargs)

    def _process_batch(self, batch):
        from ..videomae.image_processing_videomae import VivitImageProcessor

        return VivitImageProcessor._process_batch(self, batch)
