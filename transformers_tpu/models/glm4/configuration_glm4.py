"""GLM-4 config (reference src/transformers/models/glm4/configuration_glm4.py)."""

from __future__ import annotations

from ..glm.configuration_glm import GlmConfig


class Glm4Config(GlmConfig):
    model_type = "glm4"
