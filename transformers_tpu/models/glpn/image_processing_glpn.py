"""GLPN image processor (reference models/glpn/image_processing_glpn.py):
no fixed target — height/width are floored to a multiple of
``size_divisor`` (32); rescale only, no normalization."""

from __future__ import annotations

from ...image_processing_utils import BaseImageProcessor


class GLPNImageProcessor(BaseImageProcessor):
    def __init__(self, **kwargs):
        kwargs.setdefault("size_divisor", 32)
        kwargs.setdefault("do_normalize", False)
        kwargs.setdefault("size", {})
        super().__init__(**kwargs)

    def resize_size(self, height: int, width: int) -> tuple[int, int]:
        d = self.size_divisor
        return ((height // d) * d, (width // d) * d)

    def post_process_depth_estimation(self, outputs, target_sizes=None):
        from ..dpt.image_processing_dpt import DPTImageProcessor

        return DPTImageProcessor.post_process_depth_estimation(self, outputs, target_sizes)
