"""Qwen3.5-MoE decoder (reference models/qwen3_5_moe/modular_qwen3_5_moe.py):
Qwen3.5's gated deltanet (four factored input projections) with the
Qwen3-Next sparse MoE block (softmax-topk router + sigmoid-gated shared
expert) selected on every layer via the config's num_experts."""

from __future__ import annotations

from ..qwen3_5.modeling_qwen3_5 import Qwen3_5GatedDeltaNet
from ..qwen3_next.modeling_qwen3_next import (
    Qwen3NextDecoderLayer,
    Qwen3NextForCausalLM,
    Qwen3NextModel,
    Qwen3NextModelStandalone,
)
from .configuration_qwen3_5_moe import Qwen3_5MoeConfig


class Qwen3_5MoeDecoderLayer(Qwen3NextDecoderLayer):
    deltanet_cls = Qwen3_5GatedDeltaNet


class Qwen3_5MoeModel(Qwen3NextModel):
    decoder_layer_cls = Qwen3_5MoeDecoderLayer


class Qwen3_5MoeForCausalLM(Qwen3NextForCausalLM):
    config_class = Qwen3_5MoeConfig
    model_cls = Qwen3_5MoeModel
    _keys_to_ignore_on_load_unexpected = (r"^mtp\.", r"^model\.visual\.")


class Qwen3_5MoeModelStandalone(Qwen3NextModelStandalone):
    config_class = Qwen3_5MoeConfig
    model_cls = Qwen3_5MoeModel
