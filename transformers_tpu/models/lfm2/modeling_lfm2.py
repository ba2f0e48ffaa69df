"""LFM2 (Liquid Foundation Model 2) — short-conv / attention hybrid decoder
(reference models/lfm2/modeling_lfm2.py).

Most layers are **gated short convolutions** (:417: in_proj → (B, C, x),
Bx = B·x, depthwise causal conv (k=conv_L_cache, no activation), y = C·conv,
out_proj); ``full_attention`` layers are llama-style GQA with per-head q/k
RMSNorms and an ``out_proj`` name. The MLP auto-adjusts its width to a
multiple of ``block_multiple_of`` (:105); the final norm is
``embedding_norm``. Decode carries per-conv-layer [H, L] windows in the
shared HybridCache.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...cache_utils import HybridCache, init_hybrid_cache
from ...configuration_utils import PretrainedConfig
from ...core.module import Linear, RMSNorm, normal_init
from ...core.module import Module
from ..llama.modeling_llama import (LlamaAttention, LlamaForCausalLM,
                                    LlamaModel, LlamaModelStandalone)


class Lfm2Config(PretrainedConfig):
    model_type = "lfm2"
    attribute_map = {"rms_norm_eps": "norm_eps"}

    def __init__(self, vocab_size=65536, hidden_size=2560, intermediate_size=12288,
                 num_hidden_layers=32, num_attention_heads=32, num_key_value_heads=8,
                 max_position_embeddings=128000, norm_eps=1e-5, use_cache=True,
                 rope_theta=1000000.0, conv_bias=False, conv_L_cache=3,
                 block_multiple_of=256, block_ffn_dim_multiplier=1.0,
                 block_auto_adjust_ff_dim=True, full_attn_idxs=None,
                 layer_types=None, initializer_range=0.02,
                 tie_word_embeddings=True, **kwargs):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.intermediate_size = intermediate_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.num_key_value_heads = num_key_value_heads
        self.max_position_embeddings = max_position_embeddings
        self.norm_eps = norm_eps
        self.use_cache = use_cache
        self.rope_theta = rope_theta
        self.conv_bias = conv_bias
        self.conv_L_cache = conv_L_cache
        self.block_multiple_of = block_multiple_of
        self.block_ffn_dim_multiplier = block_ffn_dim_multiplier
        self.block_auto_adjust_ff_dim = block_auto_adjust_ff_dim
        self.initializer_range = initializer_range
        if layer_types is None:
            if full_attn_idxs is None:
                full_attn_idxs = list(range(num_hidden_layers))
            layer_types = ["full_attention" if i in full_attn_idxs else "conv"
                           for i in range(num_hidden_layers)]
        self.layer_types = layer_types
        super().__init__(tie_word_embeddings=tie_word_embeddings, **kwargs)


def lfm2_ffn_dim(config):
    inter = config.intermediate_size
    if config.block_auto_adjust_ff_dim:
        inter = int(2 * inter / 3)
        if config.block_ffn_dim_multiplier is not None:
            inter = int(config.block_ffn_dim_multiplier * inter)
        inter = config.block_multiple_of * (
            (inter + config.block_multiple_of - 1) // config.block_multiple_of)
    return inter


class Lfm2MLP(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        inter = lfm2_ffn_dim(config)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.w1 = Linear(config.hidden_size, inter, False, **kw)
        self.w3 = Linear(config.hidden_size, inter, False, **kw)
        self.w2 = Linear(inter, config.hidden_size, False, **kw)

    def __call__(self, params, x):
        return self.w2(params["w2"], jax.nn.silu(self.w1(params["w1"], x))
                       * self.w3(params["w3"], x))


class Lfm2Attention(LlamaAttention):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        # hub names q_layernorm/k_layernorm; applied in project_qkv below
        self.q_layernorm = RMSNorm(self.head_dim, config.norm_eps, dtype=dtype,
                                   param_dtype=param_dtype)
        self.k_layernorm = RMSNorm(self.head_dim, config.norm_eps, dtype=dtype,
                                   param_dtype=param_dtype)

    def build_projections(self, config, qkv_bias, o_bias, kw):
        h = config.hidden_size
        self.q_proj = Linear(h, self.num_heads * self.head_dim, False, **kw)
        self.k_proj = Linear(h, self.num_kv_heads * self.head_dim, False, **kw)
        self.v_proj = Linear(h, self.num_kv_heads * self.head_dim, False, **kw)
        self.out_proj = Linear(self.num_heads * self.head_dim, h, False, **kw)

    def project_qkv(self, params, hidden):
        q, k, v = super().project_qkv(params, hidden)
        q = self.q_layernorm(params["q_layernorm"], q)
        k = self.k_layernorm(params["k_layernorm"], k)
        return q, k, v

    def project_out(self, params, out):
        return self.out_proj(params["out_proj"], out)


class Lfm2ShortConv(Module):
    """reference :417 — gated depthwise causal conv (no activation)."""

    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.layer_idx = layer_idx
        self.hidden = config.hidden_size
        self.L = config.conv_L_cache
        self.use_bias = config.conv_bias
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.in_proj = Linear(config.hidden_size, 3 * config.hidden_size,
                              config.conv_bias, **kw)
        self.out_proj = Linear(config.hidden_size, config.hidden_size,
                               config.conv_bias, **kw)

    def init(self, rng):
        params = super().init(rng)
        params["conv"] = {"weight": normal_init(0.02)(
            rng, (self.hidden, 1, self.L), self.param_dtype)}
        if self.use_bias:
            params["conv"]["bias"] = jnp.zeros((self.hidden,), self.param_dtype)
        return params

    def __call__(self, params, x, cache: Optional[HybridCache], cache_position,
                 attention_mask=None):
        b, s, _ = x.shape
        if attention_mask is not None:
            x = x * attention_mask[:, :s, None].astype(x.dtype)
        bcx = self.in_proj(params["in_proj"], x)  # [B, S, 3H]
        B_, C_, x_ = jnp.split(bcx, 3, axis=-1)
        bx = jnp.swapaxes(B_ * x_, 1, 2)  # [B, H, S]
        w = params["conv"]["weight"].astype(jnp.float32)

        decode = cache is not None and cache.initialized and s == 1
        conv_state = cache.conv_states[self.layer_idx] if cache is not None else None
        if decode:
            conv_state = jnp.concatenate(
                [conv_state[:, :, 1:], bx.astype(conv_state.dtype)], axis=2)
            conv_out = jnp.sum(conv_state.astype(jnp.float32) * w[:, 0, :][None],
                               axis=-1)  # [B, H]
            if self.use_bias:
                conv_out = conv_out + params["conv"]["bias"].astype(jnp.float32)
            conv_out = conv_out[:, :, None]
        else:
            y = jax.lax.conv_general_dilated(
                bx.astype(jnp.float32), w, (1,), [(self.L - 1, 0)],
                dimension_numbers=("NCW", "OIW", "NCW"),
                feature_group_count=self.hidden)
            if self.use_bias:
                y = y + params["conv"]["bias"].astype(jnp.float32)[None, :, None]
            conv_out = y
            if cache is not None:
                pad = max(self.L - s, 0)
                conv_state = jnp.pad(bx.astype(jnp.float32),
                                     ((0, 0), (0, 0), (pad, 0)))[:, :, -self.L:]
        if cache is not None:
            from dataclasses import replace as dc_replace

            conv_states = list(cache.conv_states)
            conv_states[self.layer_idx] = conv_state.astype(
                cache.conv_states[self.layer_idx].dtype)
            cache = dc_replace(cache, conv_states=tuple(conv_states))
        y = C_ * jnp.swapaxes(conv_out.astype(self.dtype), 1, 2)
        return self.out_proj(params["out_proj"], y), cache


class Lfm2DecoderLayer(Module):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.is_attention_layer = config.layer_types[layer_idx] == "full_attention"
        if self.is_attention_layer:
            self.self_attn = Lfm2Attention(config, layer_idx, **kw)
        else:
            self.conv = Lfm2ShortConv(config, layer_idx, **kw)
        self.feed_forward = Lfm2MLP(config, **kw)
        self.operator_norm = RMSNorm(config.hidden_size, config.norm_eps, **kw)
        self.ffn_norm = RMSNorm(config.hidden_size, config.norm_eps, **kw)

    @staticmethod
    def make_norm(config, **kw):
        return RMSNorm(config.hidden_size, config.norm_eps, **kw)

    def __call__(self, params, hidden, cos, sin, attn_args, cache, cache_position):
        residual = hidden
        h = self.operator_norm(params["operator_norm"], hidden)
        if self.is_attention_layer:
            h, cache = self.self_attn(params["self_attn"], h, cos, sin, attn_args,
                                      cache, cache_position)
        else:
            mask = None
            if not (cache is not None and cache.initialized):
                mask = attn_args.get("kv_valid")
            h, cache = self.conv(params["conv"], h, cache, cache_position, mask)
        hidden = residual + h
        hidden = hidden + self.feed_forward(params["feed_forward"],
                                            self.ffn_norm(params["ffn_norm"], hidden))
        return hidden, cache


class Lfm2Model(LlamaModel):
    decoder_layer_cls = Lfm2DecoderLayer
    norm_name = "embedding_norm"

    def __call__(self, params, *args, **kwargs):
        out = super().__call__(params, *args, **kwargs)
        cache = out.past_key_values
        if cache is not None and not cache.initialized:
            from dataclasses import replace as dc_replace

            out.past_key_values = dc_replace(cache, initialized=True)
        return out


class Lfm2ForCausalLM(LlamaForCausalLM):
    config_class = Lfm2Config
    model_cls = Lfm2Model

    def init_cache(self, batch_size: int, max_len: int, dtype=None,
                   implementation: str = "static"):
        cfg = self.config
        block_types = ["attention" if t == "full_attention" else "conv"
                       for t in cfg.layer_types]
        return init_hybrid_cache(
            batch_size=batch_size, max_len=max_len, dtype=dtype or self.dtype,
            block_types=block_types, num_kv_heads=cfg.num_key_value_heads,
            head_dim=cfg.hidden_size // cfg.num_attention_heads,
            conv_shape=(cfg.hidden_size, cfg.conv_L_cache),
            ssm_shape=(1, 1))


class Lfm2ModelStandalone(LlamaModelStandalone):
    config_class = Lfm2Config
    model_cls = Lfm2Model
