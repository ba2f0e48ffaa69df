"""Apertus decoder (reference src/transformers/models/apertus/modular_apertus.py).

Llama skeleton + per-head q/k RMSNorm (qwen3-style) + a NON-gated MLP with
the learnable xIELU activation (reference activations.py XIELUActivation:
alpha_p/alpha_n are trained parameters, beta/eps persistent buffers):

    x > 0: softplus(alpha_p) x^2 + beta x
    x <= 0: (expm1(min(x, eps)) - x) (beta + softplus(alpha_n)) + beta x
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.module import Linear, Module, RMSNorm, normal_init
from ..llama.modeling_llama import (
    LlamaAttention,
    LlamaDecoderLayer,
    LlamaForCausalLM,
    LlamaModel,
    LlamaModelStandalone,
)
from .configuration_apertus import ApertusConfig


class XIELU(Module):
    """Learnable xIELU (reference activations.py:231)."""

    def init(self, rng):
        import numpy as np

        # log(expm1(0.8)) and log(expm1(0.8 - 0.5)) in float32
        return {
            "alpha_p": jnp.asarray([np.log(np.expm1(0.8))], self.param_dtype),
            "alpha_n": jnp.asarray([np.log(np.expm1(0.3))], self.param_dtype),
            "beta": jnp.asarray(0.5, self.param_dtype),
            "eps": jnp.asarray(-1e-6, self.param_dtype),
        }

    def __call__(self, params, x):
        f = jnp.float32
        alpha_p = jax.nn.softplus(params["alpha_p"].astype(f))
        beta = params["beta"].astype(f)
        eps = params["eps"].astype(f)
        alpha_n = beta + jax.nn.softplus(params["alpha_n"].astype(f))
        xf = x.astype(f)
        pos = alpha_p * xf * xf + beta * xf
        neg = (jnp.expm1(jnp.minimum(xf, eps)) - xf) * alpha_n + beta * xf
        return jnp.where(xf > 0, pos, neg).astype(x.dtype)


class ApertusMLP(Module):
    """Non-gated up/act/down (reference NemotronMLP base + xIELU)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.up_proj = Linear(config.hidden_size, config.intermediate_size, config.mlp_bias, **kw)
        self.down_proj = Linear(config.intermediate_size, config.hidden_size, config.mlp_bias, **kw)
        self.act_fn = XIELU(dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, x):
        h = self.act_fn(params["act_fn"], self.up_proj(params["up_proj"], x))
        return self.down_proj(params["down_proj"], h)


class ApertusAttention(LlamaAttention):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.q_norm = RMSNorm(self.head_dim, config.rms_norm_eps, **kw)
        self.k_norm = RMSNorm(self.head_dim, config.rms_norm_eps, **kw)


class ApertusDecoderLayer(LlamaDecoderLayer):
    attention_cls = ApertusAttention
    mlp_cls = ApertusMLP

    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        # checkpoint names: attention_layernorm / feedforward_layernorm
        self._children["attention_layernorm"] = self._children.pop("input_layernorm")
        self._children["feedforward_layernorm"] = self._children.pop("post_attention_layernorm")

    def __call__(self, params, hidden, cos, sin, attn_args, cache, cache_position):
        residual = hidden
        h = self.input_layernorm(params["attention_layernorm"], hidden)
        h, cache = self.self_attn(params["self_attn"], h, cos, sin, attn_args, cache, cache_position)
        hidden = residual + h
        residual = hidden
        h = self.post_attention_layernorm(params["feedforward_layernorm"], hidden)
        h = self.mlp(params["mlp"], h)
        return residual + h, cache


class ApertusModel(LlamaModel):
    decoder_layer_cls = ApertusDecoderLayer


class ApertusForCausalLM(LlamaForCausalLM):
    config_class = ApertusConfig
    model_cls = ApertusModel


class ApertusModelStandalone(LlamaModelStandalone):
    config_class = ApertusConfig
    model_cls = ApertusModel
