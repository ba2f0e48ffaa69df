"""Ministral decoder (reference src/transformers/models/ministral/modular_ministral.py).

Mistral semantics (llama skeleton, no qkv bias) with per-layer sliding
attention driven by ``layer_types`` — already how the skeleton reads windows
(cache_utils.layer_sliding_window), so this is a pure config swap.
"""

from __future__ import annotations

from ..llama.modeling_llama import LlamaForCausalLM, LlamaModel, LlamaModelStandalone
from .configuration_ministral import MinistralConfig


class MinistralModel(LlamaModel):
    pass


class MinistralForCausalLM(LlamaForCausalLM):
    config_class = MinistralConfig
    model_cls = MinistralModel


class MinistralModelStandalone(LlamaModelStandalone):
    config_class = MinistralConfig
    model_cls = MinistralModel
