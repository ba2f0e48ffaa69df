"""BridgeTower image processor (reference
models/bridgetower/image_processing_bridgetower.py): ViLT-style
shortest-edge-288 resize floored to size_divisor 32, center crop to 288,
CLIP stats, batch padded with a pixel_mask."""

from __future__ import annotations

from ...image_processing_utils import OPENAI_CLIP_MEAN, OPENAI_CLIP_STD
from ..vilt.image_processing_vilt import ViltImageProcessor


class BridgeTowerImageProcessor(ViltImageProcessor):
    def __init__(self, **kwargs):
        kwargs.setdefault("size", {"shortest_edge": 288})
        kwargs.setdefault("image_mean", OPENAI_CLIP_MEAN)
        kwargs.setdefault("image_std", OPENAI_CLIP_STD)
        kwargs.setdefault("do_center_crop", True)
        super().__init__(**kwargs)
        if self.do_center_crop and not self.crop_size:
            e = (self.crop_size or self.size).get("shortest_edge",
                                                  self.size["shortest_edge"])
            self.crop_size = {"height": e, "width": e}
