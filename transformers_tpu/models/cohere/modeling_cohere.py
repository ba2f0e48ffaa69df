"""Cohere (Command-R) decoder, TPU-native.

Semantics match reference src/transformers/models/cohere/modeling_cohere.py:
mean-centered LayerNorm without bias (:51), INTERLEAVED rotary (:115 cos/sin
via repeat_interleave, :175 pairwise rotate_half), optional per-head qk
LayerNorm with [heads, head_dim] weight (:236), parallel residual
``x + attn(ln(x)) + mlp(ln(x))`` with a single input norm (:330), and
``logits * logit_scale`` (:503). Word embeddings tie by default.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.module import LayerNorm, Module
from ...ops.rope import apply_rotary_pos_emb_interleaved, compute_cos_sin_interleaved
from ..llama.modeling_llama import (
    DECODER_TP_PLAN,
    LlamaAttention,
    LlamaDecoderLayer,
    LlamaForCausalLM,
    LlamaMLP,
    LlamaModel,
    LlamaModelStandalone,
)
from .configuration_cohere import CohereConfig


class CohereHeadwiseLayerNorm(Module):
    """LayerNorm over head_dim with a [heads, head_dim] weight, applied to
    [B, S, H, D] (reference CohereLayerNorm with tuple hidden_size :51)."""

    def __init__(self, num_heads: int, head_dim: int, eps: float, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.num_heads = num_heads
        self.head_dim = head_dim
        self.eps = eps

    def init(self, rng):
        return {"weight": jnp.ones((self.num_heads, self.head_dim), self.param_dtype)}

    def __call__(self, params, x):  # x [B, S, H, D]
        h = x.astype(jnp.float32)
        mean = jnp.mean(h, axis=-1, keepdims=True)
        var = jnp.var(h, axis=-1, keepdims=True)
        h = (h - mean) * jax.lax.rsqrt(var + self.eps)
        h = h * params["weight"].astype(jnp.float32)[None, None]
        return h.astype(x.dtype)


class CohereAttention(LlamaAttention):
    rope_fn = staticmethod(apply_rotary_pos_emb_interleaved)

    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        if getattr(config, "use_qk_norm", False):
            kw = dict(dtype=dtype, param_dtype=param_dtype)
            self.q_norm = CohereHeadwiseLayerNorm(
                self.num_heads, self.head_dim, config.layer_norm_eps, **kw)
            self.k_norm = CohereHeadwiseLayerNorm(
                self.num_kv_heads, self.head_dim, config.layer_norm_eps, **kw)


class CohereMLP(LlamaMLP):
    pass


class CohereDecoderLayer(LlamaDecoderLayer):
    """Parallel residual with ONE norm: x + attn(ln(x)) + mlp(ln(x))
    (reference modeling_cohere.py:330)."""

    attention_cls = CohereAttention
    mlp_cls = CohereMLP

    @staticmethod
    def make_norm(config, **kw):
        return LayerNorm(config.hidden_size, config.layer_norm_eps, use_bias=False, **kw)

    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        del self._children["post_attention_layernorm"]
        object.__delattr__(self, "post_attention_layernorm")

    def __call__(self, params, hidden, cos, sin, attn_args, cache, cache_position):
        residual = hidden
        h = self.input_layernorm(params["input_layernorm"], hidden)
        attn_out, cache = self.self_attn(params["self_attn"], h, cos, sin, attn_args,
                                         cache, cache_position)
        mlp_out = self.mlp(params["mlp"], h)
        return residual + attn_out + mlp_out, cache


class CohereModel(LlamaModel):
    decoder_layer_cls = CohereDecoderLayer

    def compute_rope(self, position_ids):
        return compute_cos_sin_interleaved(
            position_ids, self.inv_freq, self.attention_scaling, dtype=self.dtype)


class CohereForCausalLM(LlamaForCausalLM):
    config_class = CohereConfig
    model_cls = CohereModel
    _tp_plan = DECODER_TP_PLAN

    def compute_logits(self, params, hidden):
        logits = super().compute_logits(params, hidden)
        return logits * self.config.logit_scale


class CohereModelStandalone(LlamaModelStandalone):
    config_class = CohereConfig
    model_cls = CohereModel
