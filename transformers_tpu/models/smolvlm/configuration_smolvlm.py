"""SmolVLM configs (reference src/transformers/models/smolvlm — the idefics3
architecture under new names)."""

from __future__ import annotations

from ..idefics3.configuration_idefics3 import Idefics3Config, Idefics3VisionConfig


class SmolVLMVisionConfig(Idefics3VisionConfig):
    model_type = "smolvlm_vision"


class SmolVLMConfig(Idefics3Config):
    model_type = "smolvlm"
    sub_configs = {"vision_config": SmolVLMVisionConfig}

    def __init__(self, vision_config=None, **kwargs):
        if isinstance(vision_config, dict) or vision_config is None:
            vision_config = SmolVLMVisionConfig(**(vision_config or {}))
        super().__init__(vision_config=vision_config, **kwargs)
