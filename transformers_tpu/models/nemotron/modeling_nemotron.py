"""Nemotron decoder (reference src/transformers/models/nemotron/modeling_nemotron.py).

Llama skeleton with:
- ``LayerNorm1P`` norms — zero-centered gamma layer norm computed as
  ``layer_norm(x, weight + 1, bias)`` (reference NemotronLayerNorm1P :62-80);
- up/down MLP (no gate) with squared-ReLU activation (reference :183-194);
- partial rotary (``partial_rotary_factor`` applied to the leading head
  dims, standard rotate-half layout).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.module import Linear, Module, normal_init
from ..llama.modeling_llama import (
    LlamaAttention,
    LlamaDecoderLayer,
    LlamaForCausalLM,
    LlamaModel,
    LlamaModelStandalone,
)
from ...ops.activations import get_activation
from .configuration_nemotron import NemotronConfig


class LayerNorm1P(Module):
    """layer_norm(x, weight + 1, bias) (reference modeling_nemotron.py:62)."""

    def __init__(self, dim, eps, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.dim = dim
        self.eps = eps

    def init(self, rng):
        return {"weight": jnp.zeros((self.dim,), self.param_dtype),
                "bias": jnp.zeros((self.dim,), self.param_dtype)}

    def __call__(self, params, x):
        h = x.astype(jnp.float32)
        mean = jnp.mean(h, axis=-1, keepdims=True)
        var = jnp.var(h, axis=-1, keepdims=True)
        h = (h - mean) * jax.lax.rsqrt(var + self.eps)
        h = h * (params["weight"].astype(jnp.float32) + 1.0) + params["bias"].astype(jnp.float32)
        return h.astype(self.dtype)


class NemotronMLP(Module):
    """up/down with relu2 (reference modeling_nemotron.py:183)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.up_proj = Linear(config.hidden_size, config.intermediate_size, config.mlp_bias, **kw)
        self.down_proj = Linear(config.intermediate_size, config.hidden_size, config.mlp_bias, **kw)
        self.act_fn = get_activation(config.hidden_act)

    def __call__(self, params, x):
        return self.down_proj(params["down_proj"], self.act_fn(self.up_proj(params["up_proj"], x)))


class NemotronAttention(LlamaAttention):
    pass


class NemotronDecoderLayer(LlamaDecoderLayer):
    attention_cls = NemotronAttention
    mlp_cls = NemotronMLP

    @staticmethod
    def make_norm(config, **kw):
        return LayerNorm1P(config.hidden_size, config.norm_eps, **kw)


class NemotronModel(LlamaModel):
    decoder_layer_cls = NemotronDecoderLayer


class NemotronForCausalLM(LlamaForCausalLM):
    config_class = NemotronConfig
    model_cls = NemotronModel


class NemotronModelStandalone(LlamaModelStandalone):
    config_class = NemotronConfig
    model_cls = NemotronModel
