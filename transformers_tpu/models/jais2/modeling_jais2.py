"""Jais-2 decoder (reference src/transformers/models/jais2/modular_jais2.py):
Llama skeleton with an ungated squared-ReLU up/down MLP (NemotronMLP with
biases), LayerNorm (weight+bias) in place of RMSNorm, and biased attention
projections."""

from __future__ import annotations

from ...core.module import LayerNorm
from ..llama.modeling_llama import (
    LlamaDecoderLayer,
    LlamaForCausalLM,
    LlamaModel,
    LlamaModelStandalone,
)
from ..nemotron.modeling_nemotron import NemotronMLP
from .configuration_jais2 import Jais2Config


class Jais2DecoderLayer(LlamaDecoderLayer):
    mlp_cls = NemotronMLP

    @staticmethod
    def make_norm(config, **kw):
        return LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)


class Jais2Model(LlamaModel):
    decoder_layer_cls = Jais2DecoderLayer


class Jais2ForCausalLM(LlamaForCausalLM):
    config_class = Jais2Config
    model_cls = Jais2Model


class Jais2ModelStandalone(LlamaModelStandalone):
    config_class = Jais2Config
    model_cls = Jais2Model
