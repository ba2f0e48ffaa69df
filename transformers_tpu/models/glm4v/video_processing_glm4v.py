"""GLM-4V video processor (reference
models/glm4v/video_processing_glm4v.py): the Qwen2-VL grid patchify tier
(14px patches, merge 2, temporal 2) under GLM-4V's own defaults."""

from __future__ import annotations

from ..qwen2_vl.video_processing_qwen2_vl import Qwen2VLVideoProcessor


class Glm4vVideoProcessor(Qwen2VLVideoProcessor):
    pass
