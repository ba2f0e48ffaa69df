"""SmolVLM (reference src/transformers/models/smolvlm): the Idefics3
architecture under new class names."""

from __future__ import annotations

from ..idefics3.modeling_idefics3 import (Idefics3ForConditionalGeneration,
                                          Idefics3Model,
                                          Idefics3VisionTransformer)
from .configuration_smolvlm import SmolVLMConfig


class SmolVLMVisionTransformer(Idefics3VisionTransformer):
    pass


class SmolVLMModel(Idefics3Model):
    pass


class SmolVLMForConditionalGeneration(Idefics3ForConditionalGeneration):
    config_class = SmolVLMConfig
