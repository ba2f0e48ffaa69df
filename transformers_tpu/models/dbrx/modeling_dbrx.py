"""DBRX decoder (reference src/transformers/models/dbrx/modeling_dbrx.py).

Fused bias-free ``Wqkv`` with optional clipping (:198-229), dual-norm block
(``norm_attn_norm`` wraps norm_1 -> attention -> norm_2, :365-404),
MoE FFN whose expert weights live as stacked flat tensors ``w1``/``v1``
(gate/up, x @ w.T) and ``w2`` (down, applied untransposed) (:256-318), router
probabilities L-normalized per token (:338-360), bias-free LayerNorms.
Checkpoint layout ``transformer.{wte,blocks.N,norm_f}`` + ``lm_head``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...cache_utils import StaticKVCache, cache_from_config
from ...core.module import Embedding, LayerNorm, Linear, Module, normal_init
from ...generation.utils import GenerationMixin
from ...modeling_outputs import BaseModelOutputWithPast, CausalLMOutputWithPast
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...ops.attention import get_attention_fn
from ...ops.rope import apply_rotary_pos_emb, compute_cos_sin, rope_inv_freq
from .configuration_dbrx import DbrxConfig


class DbrxAttention(Module):
    def __init__(self, config: DbrxConfig, layer_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.layer_idx = layer_idx
        self.num_heads = config.n_heads
        self.head_dim = config.d_model // config.n_heads
        self.num_kv_heads = config.attn_config.kv_n_heads
        self.scale = self.head_dim**-0.5
        self.clip_qkv = config.attn_config.clip_qkv
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        qkv_out = config.d_model + 2 * self.num_kv_heads * self.head_dim
        self.Wqkv = Linear(config.d_model, qkv_out, False, **kw)
        self.out_proj = Linear(config.d_model, config.d_model, False, **kw)

    def __call__(self, params, hidden, cos, sin, attn_args, cache, cache_position):
        b, s, e = hidden.shape
        qkv = self.Wqkv(params["Wqkv"], hidden)
        if self.clip_qkv is not None:
            qkv = jnp.clip(qkv, -self.clip_qkv, self.clip_qkv)
        kv_dim = self.num_kv_heads * self.head_dim
        q = qkv[..., :e].reshape(b, s, self.num_heads, self.head_dim)
        k = qkv[..., e:e + kv_dim].reshape(b, s, self.num_kv_heads, self.head_dim)
        v = qkv[..., e + kv_dim:].reshape(b, s, self.num_kv_heads, self.head_dim)
        q, k = apply_rotary_pos_emb(q, k, cos, sin)
        if cache is not None:
            cache = cache.update(self.layer_idx, k, v, cache_position)
            k, v = cache.layer(self.layer_idx)
            k = k.astype(self.dtype)
            v = v.astype(self.dtype)
        attn_fn = get_attention_fn(self.config.attn_implementation)
        out = attn_fn(q, k, v, scale=self.scale, **attn_args)
        return self.out_proj(params["out_proj"], out.reshape(b, s, e)), cache


class DbrxNormAttentionNorm(Module):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.norm_1 = LayerNorm(config.d_model, 1e-5, use_bias=False, **kw)
        self.attn = DbrxAttention(config, layer_idx, **kw)
        self.norm_2 = LayerNorm(config.d_model, 1e-5, use_bias=False, **kw)

    def __call__(self, params, hidden, cos, sin, attn_args, cache, cache_position):
        residual = hidden
        h = self.norm_1(params["norm_1"], hidden)
        h, cache = self.attn(params["attn"], h, cos, sin, attn_args, cache, cache_position)
        hidden = residual + h
        return hidden, self.norm_2(params["norm_2"], hidden), cache


class DbrxFFN(Module):
    def __init__(self, config: DbrxConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        ffn = config.ffn_config
        self.hidden_size = config.d_model
        self.ffn_hidden = ffn.ffn_hidden_size
        self.num_experts = ffn.moe_num_experts
        self.top_k = ffn.moe_top_k
        self.norm_p = ffn.moe_normalize_expert_weights
        self.router = _DbrxRouter(config, dtype=dtype, param_dtype=param_dtype)
        self.experts = _DbrxExperts(config, dtype=dtype, param_dtype=param_dtype)
        self.act = get_activation(ffn.ffn_act_fn.get("name", "silu"))

    def __call__(self, params, hidden):
        b, s, h = hidden.shape
        x = hidden.reshape(b * s, h)
        logits = self.router(params["router"], x).astype(jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1)
        weights, idx = jax.lax.top_k(probs, self.top_k)
        if self.norm_p is not None:
            norm = jnp.sum(jnp.abs(weights) ** self.norm_p, axis=-1, keepdims=True) ** (1.0 / self.norm_p)
            weights = weights / norm
        out = self.experts(params["experts"], x, weights, idx, self.act)
        return out.reshape(b, s, h).astype(hidden.dtype)


class _DbrxRouter(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.layer = Linear(config.d_model, config.ffn_config.moe_num_experts, False,
                            dtype=dtype, param_dtype=param_dtype,
                            kernel_init=normal_init(config.initializer_range))

    def __call__(self, params, x):
        return self.layer(params["layer"], x)


class _DbrxExperts(Module):
    """stacked flat expert weights under ``experts.mlp.{w1,v1,w2}``."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.mlp = _DbrxExpertGLU(config, dtype=dtype, param_dtype=param_dtype)
        self.num_experts = config.ffn_config.moe_num_experts
        self.ffn_hidden = config.ffn_config.ffn_hidden_size
        self.hidden = config.d_model

    def __call__(self, params, x, weights, idx, act):
        e, f, h = self.num_experts, self.ffn_hidden, self.hidden
        p = params["mlp"]
        w1 = p["w1"].astype(self.dtype).reshape(e, f, h)
        v1 = p["v1"].astype(self.dtype).reshape(e, f, h)
        w2 = p["w2"].astype(self.dtype).reshape(e, f, h)
        xt = x.astype(self.dtype)
        gate = jnp.einsum("th,efh->etf", xt, w1)
        up = jnp.einsum("th,efh->etf", xt, v1)
        inter = act(gate) * up
        down = jnp.einsum("etf,efh->eth", inter, w2)  # w2 applied untransposed
        onehot = jax.nn.one_hot(idx, e, dtype=jnp.float32)      # [T, k, E]
        combine = jnp.einsum("tke,tk->et", onehot, weights)      # [E, T]
        return jnp.einsum("eth,et->th", down.astype(jnp.float32), combine)


class _DbrxExpertGLU(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.shape = (config.ffn_config.moe_num_experts * config.ffn_config.ffn_hidden_size,
                      config.d_model)

    def init(self, rng):
        k1, k2, k3 = jax.random.split(rng, 3)
        init = normal_init(0.02)
        return {"w1": init(k1, self.shape, self.param_dtype),
                "v1": init(k2, self.shape, self.param_dtype),
                "w2": init(k3, self.shape, self.param_dtype)}


class DbrxBlock(Module):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.norm_attn_norm = DbrxNormAttentionNorm(config, layer_idx, **kw)
        self.ffn = DbrxFFN(config, **kw)

    def __call__(self, params, hidden, cos, sin, attn_args, cache, cache_position):
        residual, normed, cache = self.norm_attn_norm(
            params["norm_attn_norm"], hidden, cos, sin, attn_args, cache, cache_position)
        return residual + self.ffn(params["ffn"], normed), cache


class DbrxModel(Module):
    def __init__(self, config: DbrxConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.wte = Embedding(config.vocab_size, config.d_model,
                             embedding_init=normal_init(config.initializer_range), **kw)
        self.blocks = [DbrxBlock(config, i, **kw) for i in range(config.n_layers)]
        self.norm_f = LayerNorm(config.d_model, 1e-5, use_bias=False, **kw)
        self.inv_freq, self.attention_scaling = rope_inv_freq(config)

    def __call__(self, params, input_ids=None, attention_mask=None, position_ids=None,
                 past_key_values=None, cache_position=0, inputs_embeds=None,
                 output_hidden_states=False) -> BaseModelOutputWithPast:
        if inputs_embeds is None:
            inputs_embeds = self.wte(params["wte"], input_ids)
        hidden = inputs_embeds
        b, s, _ = hidden.shape
        if position_ids is None:
            position_ids = jnp.arange(s, dtype=jnp.int32)[None, :] + jnp.asarray(cache_position, jnp.int32)
            position_ids = jnp.broadcast_to(position_ids, (b, s))
        cos, sin = compute_cos_sin(position_ids, self.inv_freq, self.attention_scaling,
                                   dtype=self.dtype)
        kv_len = past_key_values.max_len if past_key_values is not None else s
        q_positions = jnp.asarray(cache_position, jnp.int32) + jnp.arange(s, dtype=jnp.int32)[None, :]
        q_positions = jnp.broadcast_to(q_positions, (b, s))
        kv_valid = attention_mask if attention_mask is not None else jnp.ones((b, kv_len), jnp.int32)
        attn_args = {"q_positions": q_positions, "kv_valid": kv_valid, "is_causal": True}

        all_hidden = [] if output_hidden_states else None
        cache = past_key_values
        for i, block in enumerate(self.blocks):
            if output_hidden_states:
                all_hidden.append(hidden)
            hidden, cache = block(params["blocks"][str(i)], hidden, cos, sin,
                                  attn_args, cache, cache_position)
        hidden = self.norm_f(params["norm_f"], hidden)
        if output_hidden_states:
            all_hidden.append(hidden)
        return BaseModelOutputWithPast(
            last_hidden_state=hidden, past_key_values=cache,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None)


class DbrxPreTrainedModel(PreTrainedModel):
    config_class = DbrxConfig
    base_model_prefix = "transformer"


class DbrxForCausalLM(DbrxPreTrainedModel, GenerationMixin):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.transformer = DbrxModel(config, dtype=self.dtype, param_dtype=self.param_dtype)
        self.lm_head = Linear(config.d_model, config.vocab_size, False, dtype=self.dtype,
                              param_dtype=self.param_dtype,
                              kernel_init=normal_init(config.initializer_range))

    def get_input_embedding_path(self):
        return "transformer.wte.weight"

    def __call__(self, params, input_ids=None, attention_mask=None, position_ids=None,
                 past_key_values=None, cache_position=0, inputs_embeds=None, labels=None,
                 logits_to_keep: int = 0, output_hidden_states=False) -> CausalLMOutputWithPast:
        outputs = self.transformer(params["transformer"], input_ids, attention_mask,
                                   position_ids, past_key_values, cache_position,
                                   inputs_embeds, output_hidden_states)
        hidden = outputs.last_hidden_state
        if logits_to_keep:
            hidden = hidden[:, -logits_to_keep:, :]
        logits = self.lm_head(params["lm_head"], hidden)
        loss = None
        if labels is not None:
            from ...loss import for_causal_lm_loss

            loss = for_causal_lm_loss(logits, labels, self.config.vocab_size)
        return CausalLMOutputWithPast(loss=loss, logits=logits,
                                      past_key_values=outputs.past_key_values,
                                      hidden_states=outputs.hidden_states)

    def init_cache(self, batch_size, max_len, dtype=None, implementation="static"):
        from ...cache_utils import init_static_cache

        c = self.config
        return init_static_cache(num_layers=c.n_layers, batch_size=batch_size,
                                 max_len=max_len, num_kv_heads=c.attn_config.kv_n_heads,
                                 head_dim=c.d_model // c.n_heads, dtype=dtype or self.dtype)


class DbrxModelStandalone(DbrxPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.transformer = DbrxModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.transformer(params["transformer"], *args, **kwargs)
