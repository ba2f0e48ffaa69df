"""SmolVLM video processor (reference
models/smolvlm/video_processing_smolvlm.py): aspect-preserving longest-edge
resize per frame (no grid splitting for video), ImageNet-standard 0.5
stats."""

from __future__ import annotations

from ... import image_transforms as T
from ...video_processing_utils import BaseVideoProcessor


class SmolVLMVideoProcessor(BaseVideoProcessor):
    def __init__(self, **kwargs):
        kwargs.setdefault("size", {"longest_edge": 512})
        kwargs.setdefault("resample", "lanczos")
        kwargs.setdefault("image_mean", [0.5, 0.5, 0.5])
        kwargs.setdefault("image_std", [0.5, 0.5, 0.5])
        super().__init__(**kwargs)

    def resize_size(self, height: int, width: int):
        long = self.size["longest_edge"]
        if max(height, width) <= long:
            return (height, width)
        scale = long / max(height, width)
        return (max(1, int(height * scale)), max(1, int(width * scale)))
