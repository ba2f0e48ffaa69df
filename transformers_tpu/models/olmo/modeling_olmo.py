"""OLMo (v1) decoder (reference src/transformers/models/olmo/modeling_olmo.py).

Llama skeleton with PARAMETER-FREE LayerNorms (no weight/bias, :49-61) and
optional ``clip_qkv`` clamping of the q/k/v projections (:245-248).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.module import Module
from ..llama.modeling_llama import (
    LlamaAttention,
    LlamaDecoderLayer,
    LlamaForCausalLM,
    LlamaMLP,
    LlamaModel,
    LlamaModelStandalone,
)
from .configuration_olmo import OlmoConfig


class OlmoLayerNorm(Module):
    """LayerNorm with no learnable parameters (reference :49-61)."""

    def __init__(self, dim, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)

    def init(self, rng):
        return {}

    def __call__(self, params, x):
        h = x.astype(jnp.float32)
        mean = jnp.mean(h, axis=-1, keepdims=True)
        var = jnp.var(h, axis=-1, keepdims=True)
        return ((h - mean) * jax.lax.rsqrt(var + 1e-5)).astype(x.dtype)


class OlmoAttention(LlamaAttention):
    def project_qkv(self, params, hidden):
        b, s, _ = hidden.shape
        q = self.q_proj(params["q_proj"], hidden)
        k = self.k_proj(params["k_proj"], hidden)
        v = self.v_proj(params["v_proj"], hidden)
        clip = self.config.clip_qkv
        if clip is not None:
            q = jnp.clip(q, -clip, clip)
            k = jnp.clip(k, -clip, clip)
            v = jnp.clip(v, -clip, clip)
        return (q.reshape(b, s, self.num_heads, self.head_dim),
                k.reshape(b, s, self.num_kv_heads, self.head_dim),
                v.reshape(b, s, self.num_kv_heads, self.head_dim))


class OlmoDecoderLayer(LlamaDecoderLayer):
    attention_cls = OlmoAttention
    mlp_cls = LlamaMLP

    @staticmethod
    def make_norm(config, **kw):
        return OlmoLayerNorm(config.hidden_size, **kw)


class OlmoModel(LlamaModel):
    decoder_layer_cls = OlmoDecoderLayer


class OlmoForCausalLM(LlamaForCausalLM):
    config_class = OlmoConfig
    model_cls = OlmoModel


class OlmoModelStandalone(LlamaModelStandalone):
    config_class = OlmoConfig
    model_cls = OlmoModel
