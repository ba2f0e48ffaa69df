"""Starcoder2 decoder (reference models/starcoder2/modeling_starcoder2.py):
Llama skeleton with biased projections (use_bias), a plain c_fc/c_proj gelu
MLP, and LayerNorm (with bias) norms."""

from __future__ import annotations

from ...core.module import LayerNorm, Linear, Module, normal_init
from ...ops.activations import get_activation
from ..llama.modeling_llama import (
    LlamaAttention,
    LlamaDecoderLayer,
    LlamaForCausalLM,
    LlamaModel,
    LlamaModelStandalone,
)
from .configuration_starcoder2 import Starcoder2Config


class Starcoder2MLP(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.c_fc = Linear(config.hidden_size, config.intermediate_size, config.use_bias, **kw)
        self.c_proj = Linear(config.intermediate_size, config.hidden_size, config.use_bias, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, x):
        return self.c_proj(params["c_proj"], self.act(self.c_fc(params["c_fc"], x)))


class Starcoder2Attention(LlamaAttention):
    pass


class Starcoder2DecoderLayer(LlamaDecoderLayer):
    attention_cls = Starcoder2Attention
    mlp_cls = Starcoder2MLP

    @staticmethod
    def make_norm(config, **kw):
        return LayerNorm(config.hidden_size, config.norm_epsilon, **kw)


class Starcoder2Model(LlamaModel):
    decoder_layer_cls = Starcoder2DecoderLayer


class Starcoder2ForCausalLM(LlamaForCausalLM):
    config_class = Starcoder2Config
    model_cls = Starcoder2Model


class Starcoder2ModelStandalone(LlamaModelStandalone):
    config_class = Starcoder2Config
    model_cls = Starcoder2Model
