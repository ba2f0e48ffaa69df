"""Phi decoder (reference models/phi/modeling_phi.py): parallel residual with
one input layernorm (x + attn(ln(x)) + mlp(ln(x))), partial rotary, biased
projections with the output named ``dense``, fc1/fc2 gelu MLP, final
layernorm named ``final_layernorm``, lm_head WITH bias."""

from __future__ import annotations

import jax.numpy as jnp

from ...core.module import LayerNorm, Linear, Module, normal_init
from ...generation.utils import GenerationMixin
from ...modeling_outputs import CausalLMOutputWithPast
from ...ops.activations import get_activation
from ..llama.modeling_llama import (
    LlamaAttention,
    LlamaDecoderLayer,
    LlamaForCausalLM,
    LlamaModel,
    LlamaModelStandalone,
)
from .configuration_phi import PhiConfig


class PhiMLP(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.fc1 = Linear(config.hidden_size, config.intermediate_size, True, **kw)
        self.fc2 = Linear(config.intermediate_size, config.hidden_size, True, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, x):
        return self.fc2(params["fc2"], self.act(self.fc1(params["fc1"], x)))


class PhiAttention(LlamaAttention):
    def build_projections(self, config, qkv_bias, o_bias, kw):
        self.q_proj = Linear(config.hidden_size, self.num_heads * self.head_dim, True, **kw)
        self.k_proj = Linear(config.hidden_size, self.num_kv_heads * self.head_dim, True, **kw)
        self.v_proj = Linear(config.hidden_size, self.num_kv_heads * self.head_dim, True, **kw)
        self.dense = Linear(self.num_heads * self.head_dim, config.hidden_size, True, **kw)

    def project_out(self, params, out):
        return self.dense(params["dense"], out)


class PhiDecoderLayer(LlamaDecoderLayer):
    attention_cls = PhiAttention
    mlp_cls = PhiMLP

    @staticmethod
    def make_norm(config, **kw):
        return LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)

    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        del self._children["post_attention_layernorm"]
        object.__delattr__(self, "post_attention_layernorm")

    def __call__(self, params, hidden, cos, sin, attn_args, cache, cache_position):
        residual = hidden
        normed = self.input_layernorm(params["input_layernorm"], hidden)
        attn_out, cache = self.self_attn(params["self_attn"], normed, cos, sin, attn_args,
                                         cache, cache_position)
        mlp_out = self.mlp(params["mlp"], normed)
        return attn_out + mlp_out + residual, cache


class PhiModel(LlamaModel):
    decoder_layer_cls = PhiDecoderLayer
    norm_name = "final_layernorm"


class PhiForCausalLM(LlamaForCausalLM):
    config_class = PhiConfig
    model_cls = PhiModel

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        # Phi's lm_head has a bias (reference PhiForCausalLM)
        if not config.tie_word_embeddings:
            self.lm_head = Linear(config.hidden_size, config.vocab_size, True, dtype=self.dtype,
                                  param_dtype=self.param_dtype,
                                  kernel_init=normal_init(config.initializer_range))


class PhiModelStandalone(LlamaModelStandalone):
    config_class = PhiConfig
    model_cls = PhiModel
