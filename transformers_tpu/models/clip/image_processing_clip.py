"""CLIP image processor (reference models/clip/image_processing_clip.py):
resize shortest edge 224 bicubic, center-crop 224, rescale, CLIP mean/std."""

from __future__ import annotations

from ...image_processing_utils import OPENAI_CLIP_MEAN, OPENAI_CLIP_STD, BaseImageProcessor


class CLIPImageProcessor(BaseImageProcessor):
    def __init__(self, **kwargs):
        kwargs.setdefault("size", {"shortest_edge": 224})
        kwargs.setdefault("resample", "bicubic")
        kwargs.setdefault("do_center_crop", True)
        kwargs.setdefault("crop_size", {"height": 224, "width": 224})
        kwargs.setdefault("image_mean", OPENAI_CLIP_MEAN)
        kwargs.setdefault("image_std", OPENAI_CLIP_STD)
        kwargs.setdefault("do_convert_rgb", True)
        super().__init__(**kwargs)
