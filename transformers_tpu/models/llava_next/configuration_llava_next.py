"""LLaVA-NeXT config (reference src/transformers/models/llava_next/configuration_llava_next.py)."""

from __future__ import annotations

from ..llava.configuration_llava import LlavaConfig


class LlavaNextConfig(LlavaConfig):
    model_type = "llava_next"

    def __init__(self, image_grid_pinpoints=None, **kwargs):
        self.image_grid_pinpoints = (image_grid_pinpoints
                                     if image_grid_pinpoints is not None
                                     else [[336, 672], [672, 336], [672, 672],
                                           [1008, 336], [336, 1008]])
        super().__init__(**kwargs)
