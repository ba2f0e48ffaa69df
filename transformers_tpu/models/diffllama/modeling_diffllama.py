"""DiffLlama decoder (reference src/transformers/models/diffllama/modular_diffllama.py).

Differential attention (Differential Transformer, arXiv:2410.05258): head
pairs compute ``(softmax_1 - lambda * softmax_2) . V`` where V is the
2*head_dim concatenation of a value-head pair, lambda is a learned scalar
``exp(lq1.lk1) - exp(lq2.lk2) + lambda_init`` with
``lambda_init = 0.8 - 0.6 exp(-0.3 layer_idx)``, and the combined output is
parameter-free-RMS-normalized and scaled by ``1 - lambda_init``.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ...cache_utils import cache_from_config
from ...ops.attention import repeat_kv
from ..llama.modeling_llama import (
    LlamaAttention,
    LlamaDecoderLayer,
    LlamaForCausalLM,
    LlamaModel,
    LlamaModelStandalone,
)
from .configuration_diffllama import DiffLlamaConfig


def lambda_init_fn(layer_idx):
    return 0.8 - 0.6 * math.exp(-0.3 * layer_idx)


class DiffLlamaAttention(LlamaAttention):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        self.lambda_init = lambda_init_fn(layer_idx)
        self.rms_eps = config.rms_norm_eps

    def init(self, rng):
        params = super().init(rng)
        ks = jax.random.split(rng, 4)
        std = self.config.lambda_std_dev
        for name, k in zip(("lambda_q1", "lambda_k1", "lambda_q2", "lambda_k2"), ks):
            params[name] = (jax.random.normal(k, (self.head_dim,), jnp.float32) * std
                            ).astype(self.param_dtype)
        return params

    def __call__(self, params, hidden, cos, sin, attn_args, cache, cache_position):
        b, s, _ = hidden.shape
        q, k, v = self.project_qkv(params, hidden)
        if cos is not None:
            q, k = self.rope_fn(q, k, cos, sin)
        if cache is not None:
            cache = cache.update(self.layer_idx, k, v, cache_position)
            k_full, v_full = cache.layer(self.layer_idx)
            k_full = k_full.astype(self.dtype)
            v_full = v_full.astype(self.dtype)
        else:
            k_full, v_full = k, v

        h, d = self.num_heads, self.head_dim
        g = h // self.num_kv_heads
        kr = repeat_kv(k_full, g)  # [B, T, H, D]
        vr = repeat_kv(v_full, g)
        # value-head pairs -> [B, T, H/2, 2D], tiled back to H heads
        v1, v2 = jnp.split(vr, 2, axis=2)
        vpair = jnp.concatenate([v1, v2], axis=-1)          # [B, T, H/2, 2D]
        vpair = jnp.tile(vpair, (1, 1, 2, 1))               # [B, T, H, 2D]

        from ...ops.attention import _render_bias

        bias = _render_bias(q, k_full, attn_args.get("q_positions"),
                            attn_args.get("kv_valid"),
                            attn_args.get("is_causal", True), self.sliding_window)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, kr,
                            preferred_element_type=jnp.float32) * self.scale
        probs = jax.nn.softmax(scores + bias.astype(jnp.float32), axis=-1).astype(q.dtype)
        out = jnp.einsum("bhqk,bkhe->bqhe", probs, vpair)   # [B, S, H, 2D]

        f = jnp.float32
        lam1 = jnp.exp(jnp.sum(params["lambda_q1"].astype(f) * params["lambda_k1"].astype(f)))
        lam2 = jnp.exp(jnp.sum(params["lambda_q2"].astype(f) * params["lambda_k2"].astype(f)))
        lam = (lam1 - lam2 + self.lambda_init).astype(q.dtype)
        o1, o2 = jnp.split(out, 2, axis=2)                  # [B, S, H/2, 2D]
        o = o1 - lam * o2
        # parameter-free RMSNorm over the 2D axis
        var = jnp.mean(jnp.square(o.astype(f)), axis=-1, keepdims=True)
        o = (o.astype(f) * jax.lax.rsqrt(var + self.rms_eps)).astype(q.dtype)
        o = (1.0 - self.lambda_init) * o
        o = o.reshape(b, s, (h // 2) * 2 * d)
        return self.project_out(params, o), cache


class DiffLlamaDecoderLayer(LlamaDecoderLayer):
    attention_cls = DiffLlamaAttention


class DiffLlamaModel(LlamaModel):
    decoder_layer_cls = DiffLlamaDecoderLayer


class DiffLlamaForCausalLM(LlamaForCausalLM):
    config_class = DiffLlamaConfig
    model_cls = DiffLlamaModel

    def init_cache(self, batch_size, max_len, dtype=None, implementation="static"):
        # custom attention reads the buffer directly -> keep bshd layout
        return cache_from_config(self.config, batch_size, max_len, dtype or self.dtype,
                                 implementation=implementation, layout="bshd")


class DiffLlamaModelStandalone(LlamaModelStandalone):
    config_class = DiffLlamaConfig
    model_cls = DiffLlamaModel
