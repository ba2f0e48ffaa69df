"""Arcee decoder (reference src/transformers/models/arcee/modular_arcee.py):
Llama skeleton with an ungated squared-ReLU up/down MLP (NemotronMLP)."""

from __future__ import annotations

from ..llama.modeling_llama import (
    LlamaDecoderLayer,
    LlamaForCausalLM,
    LlamaModel,
    LlamaModelStandalone,
)
from ..nemotron.modeling_nemotron import NemotronMLP
from .configuration_arcee import ArceeConfig


class ArceeDecoderLayer(LlamaDecoderLayer):
    mlp_cls = NemotronMLP


class ArceeModel(LlamaModel):
    decoder_layer_cls = ArceeDecoderLayer


class ArceeForCausalLM(LlamaForCausalLM):
    config_class = ArceeConfig
    model_cls = ArceeModel


class ArceeModelStandalone(LlamaModelStandalone):
    config_class = ArceeConfig
    model_cls = ArceeModel
