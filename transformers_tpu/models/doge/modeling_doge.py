"""Doge (reference models/doge/modeling_doge.py).

Dynamic Mask Attention decoder: per-kv-head gates ``exp(A * softplus(dt))``
computed from the (cached) value stream are ADDED to the attention scores,
and when the kv length exceeds ``keep_window_size`` only the top-k scored
slots per query survive (:252-372). q/k RMSNorm before rope, learned
per-channel residual scales ``input_residual``/``post_attention_residual``
(:447-494), and optionally the CDMoE block: product-key retrieval over
``num_experts`` rank-1 experts mixed into a shared SwiGLU MLP (:390-445).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ...configuration_utils import PretrainedConfig
from ...core.module import Embedding, Linear, Module, RMSNorm, normal_init
from ...ops.activations import get_activation
from ...ops.attention import eager_attention
from ...ops.attention import _render_bias
from ..llama.modeling_llama import (
    LlamaAttention,
    LlamaDecoderLayer,
    LlamaForCausalLM,
    LlamaMLP,
    LlamaModel,
    LlamaModelStandalone,
)


class DogeConfig(PretrainedConfig):
    model_type = "doge"

    def __init__(self, vocab_size=32768, hidden_size=1024, intermediate_size=2048,
                 num_hidden_layers=32, hidden_dropout=0.0, hidden_act="silu",
                 initializer_range=0.02, rms_norm_eps=1e-6, use_cache=True,
                 tie_word_embeddings=False, max_position_embeddings=2048,
                 rope_theta=10000.0, rope_scaling=None, num_attention_heads=8,
                 num_key_value_heads=None, attention_bias=False, attention_dropout=0.0,
                 mlp_bias=False, sliding_window=None, keep_window_size=2048,
                 is_moe=False, num_experts=16384, num_experts_per_tok=64,
                 norm_topk_prob=False, output_router_logits=False,
                 router_aux_loss_coef=0.001, **kwargs):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.intermediate_size = intermediate_size
        self.num_hidden_layers = num_hidden_layers
        self.hidden_dropout = hidden_dropout
        self.hidden_act = hidden_act
        self.initializer_range = initializer_range
        self.rms_norm_eps = rms_norm_eps
        self.use_cache = use_cache
        self.max_position_embeddings = max_position_embeddings
        self.rope_theta = rope_theta
        self.rope_scaling = rope_scaling
        self.num_attention_heads = num_attention_heads
        self.num_key_value_heads = (num_key_value_heads if num_key_value_heads is not None
                                    else num_attention_heads)
        self.attention_bias = attention_bias
        self.attention_dropout = attention_dropout
        self.mlp_bias = mlp_bias
        self.sliding_window = sliding_window
        self.keep_window_size = keep_window_size
        self.is_moe = is_moe
        self.num_experts = num_experts
        self.num_experts_per_tok = num_experts_per_tok
        self.norm_topk_prob = norm_topk_prob
        self.output_router_logits = output_router_logits
        self.router_aux_loss_coef = router_aux_loss_coef
        super().__init__(tie_word_embeddings=tie_word_embeddings, **kwargs)


class DogeAttention(LlamaAttention):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        lkw = dict(**kw, kernel_init=normal_init(config.initializer_range))
        self.keep_window_size = config.keep_window_size
        self.q_norm = RMSNorm(self.head_dim, config.rms_norm_eps, **kw)
        self.k_norm = RMSNorm(self.head_dim, config.rms_norm_eps, **kw)
        self.dt_proj = Linear(self.num_kv_heads * self.head_dim, self.num_kv_heads,
                              config.attention_bias, **lkw)

    def init(self, rng):
        params = super().init(rng)
        params["A"] = jnp.zeros((self.num_kv_heads,), self.param_dtype)
        return params

    def __call__(self, params, hidden, cos, sin, attn_args, cache, cache_position):
        b, s, _ = hidden.shape
        q, k, v = self.project_qkv(params, hidden)
        q = self.q_norm(params["q_norm"], q)
        k = self.k_norm(params["k_norm"], k)
        q, k = self.rope_fn(q, k, cos, sin)
        if cache is not None:
            cache = cache.update(self.layer_idx, k, v, cache_position)
            k, v = cache.layer(self.layer_idx)
            if getattr(cache, "layout", "bshd") == "bhsd":
                k = jnp.swapaxes(k, 1, 2)
                v = jnp.swapaxes(v, 1, 2)
            k = k.astype(self.dtype)
            v = v.astype(self.dtype)
        kv_len = k.shape[1]

        # dynamic mask from the (full) value stream (reference :305-317)
        dt = self.dt_proj(params["dt_proj"], v.reshape(b, kv_len, -1))  # [B, KV, KVH]
        A = params["A"].astype(jnp.float32)
        dt = jnp.exp(A * jax.nn.softplus(dt.astype(jnp.float32)))  # [B, KV, KVH]
        dt = jnp.swapaxes(dt, 1, 2)  # [B, KVH, KV]

        base = _render_bias(q, k, attn_args.get("q_positions"),
                            attn_args.get("kv_valid"),
                            attn_args.get("is_causal", True), None, None, None, None)
        # base: [B, 1, Q, KV] additive (0 allowed / min masked)
        min_val = jnp.finfo(jnp.float32).min
        bias = jnp.where(base < 0, min_val, dt[:, :, None, :])  # [B, KVH, Q, KV]
        bias = jnp.broadcast_to(bias, (b, self.num_kv_heads, q.shape[1], kv_len))
        if kv_len > self.keep_window_size:
            _, topk_idx = jax.lax.top_k(bias, self.keep_window_size)
            keep = jnp.zeros_like(bias).at[
                jnp.arange(b)[:, None, None, None],
                jnp.arange(self.num_kv_heads)[None, :, None, None],
                jnp.arange(q.shape[1])[None, None, :, None],
                topk_idx].set(1.0)
            bias = jnp.where(keep == 0.0, min_val, bias)
        groups = self.num_heads // self.num_kv_heads
        bias = jnp.repeat(bias, groups, axis=1)  # [B, H, Q, KV]

        out = eager_attention(q, k, v, bias, scale=self.scale,
                              probs_sink=attn_args.get("probs_sink"))
        out = out.reshape(b, s, self.num_heads * self.head_dim)
        return self.project_out(params, out), cache


class DogeCDMoE(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        lkw = dict(**kw, kernel_init=normal_init(config.initializer_range))
        ekw = dict(**kw, embedding_init=normal_init(config.initializer_range))
        h, inter = config.hidden_size, config.intermediate_size
        self.num_experts = config.num_experts
        self.num_keys = math.floor(math.sqrt(self.num_experts))
        self.top_k = config.num_experts_per_tok
        self.norm_topk_prob = config.norm_topk_prob
        self.gate_proj = Linear(h, inter, config.mlp_bias, **lkw)
        self.up_proj = Linear(h, inter, config.mlp_bias, **lkw)
        self.down_proj = Linear(inter, h, config.mlp_bias, **lkw)
        self.router_gate = Linear(h, self.num_keys * 2, False, **lkw)
        self.down_embed = Embedding(self.num_experts, h, **ekw)
        self.up_embed = Embedding(self.num_experts, h, **ekw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, hidden):
        b, s, h = hidden.shape
        n = b * s
        x = hidden.reshape(n, h)
        router_logits = self.router_gate(params["router_gate"], x)  # [N, 2*keys]
        rx, ry = router_logits[:, : self.num_keys], router_logits[:, self.num_keys:]
        # NB reference views as [2, N, keys]: row-major split means first half
        # of the flat [N*2*keys] buffer -> handled by view(2, bsz*seq, -1) on
        # the [N, 2*keys] tensor, which interleaves differently; reproduce it:
        flat = router_logits.reshape(-1)
        rx = flat[: n * self.num_keys].reshape(n, self.num_keys)
        ry = flat[n * self.num_keys:].reshape(n, self.num_keys)
        sx, ix = jax.lax.top_k(rx, self.num_keys)
        sy, iy = jax.lax.top_k(ry, self.num_keys)
        all_scores = (sx[:, :, None] + sy[:, None, :]).reshape(n, -1)
        all_indices = (ix[:, :, None] * self.num_keys + iy[:, None, :]).reshape(n, -1)
        scores, pos = jax.lax.top_k(all_scores, self.top_k)
        indices = jnp.take_along_axis(all_indices, pos, axis=-1)  # [N, top_k]
        weights = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        if self.norm_topk_prob:
            weights = weights / weights.sum(axis=-1, keepdims=True)
        down = self.down_embed(params["down_embed"], indices)  # [N, top_k, H]
        up = self.up_embed(params["up_embed"], indices)
        ew = jnp.einsum("nkh,nh->nk", down, x)
        ew = self.act(ew) * weights.astype(ew.dtype)
        experts_states = jnp.einsum("nk,nkh->nh", ew, up).reshape(b, s, h)
        shared = self.down_proj(params["down_proj"],
                                self.act(self.gate_proj(params["gate_proj"], hidden))
                                * self.up_proj(params["up_proj"], hidden))
        return shared + experts_states


class DogeDecoderLayer(LlamaDecoderLayer):
    attention_cls = DogeAttention
    mlp_cls = LlamaMLP

    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        if config.is_moe:
            del self._children["mlp"]
            object.__delattr__(self, "mlp")
            self.mlp = DogeCDMoE(config, dtype=dtype, param_dtype=param_dtype)
        self.hidden_size = config.hidden_size

    def init(self, rng):
        params = super().init(rng)
        params["input_residual"] = jnp.ones((self.hidden_size,), self.param_dtype)
        params["post_attention_residual"] = jnp.ones((self.hidden_size,), self.param_dtype)
        return params

    def __call__(self, params, hidden, cos, sin, attn_args, cache, cache_position):
        residual = hidden
        h = self.input_layernorm(params["input_layernorm"], hidden)
        h, cache = self.self_attn(params["self_attn"], h, cos, sin, attn_args,
                                  cache, cache_position)
        hidden = params["input_residual"].astype(h.dtype) * residual + h
        residual = hidden
        h = self.post_attention_layernorm(params["post_attention_layernorm"], hidden)
        h = self.mlp(params["mlp"], h)
        return params["post_attention_residual"].astype(h.dtype) * residual + h, cache


class DogeModel(LlamaModel):
    decoder_layer_cls = DogeDecoderLayer


class DogeForCausalLM(LlamaForCausalLM):
    config_class = DogeConfig
    model_cls = DogeModel


class DogeModelStandalone(LlamaModelStandalone):
    config_class = DogeConfig
    model_cls = DogeModel
