"""Mllama — Llama 3.2 Vision (reference src/transformers/models/mllama/modeling_mllama.py).

Two-tower design: a tiled ViT with gated tile/position embeddings and a
global encoder (:812 MllamaVisionModel), cross-attended by a Llama decoder
whose every Nth layer is a tanh-gated cross-attention block (:655). Vision
features concatenate the final hidden state with ``intermediate_layers_indices``
outputs (vision_output_dim = hidden * (1 + n_intermediate)).

TPU-native generation: cross-attention K/V are computed once at prefill and
carried inside :class:`MllamaCache` (a pytree) through the ``lax.while_loop``
decode — the analog of the reference caching cross K/V in DynamicCache
(:437-440) and repeating the last cross-mask row per step (:1572-1576).
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ...cache_utils import StaticKVCache, init_static_cache
from ...core.loading import WeightRule
from ...core.module import (Embedding, LayerNorm, Linear, Module, RMSNorm,
                            normal_init)
from ...generation.utils import GenerationMixin
from ...modeling_outputs import BaseModelOutputWithPast, CausalLMOutputWithPast
from ...modeling_utils import PreTrainedModel
from ...ops.attention import eager_attention
from ...ops.rope import compute_cos_sin, rope_inv_freq
from ...ops.activations import get_activation
from ..llama.modeling_llama import LlamaDecoderLayer, LlamaMLP
from .configuration_mllama import MllamaConfig, MllamaTextConfig, MllamaVisionConfig

NEG = float(jnp.finfo(jnp.float32).min)


# ---------------------------------------------------------------- vision ----


class MllamaPrecomputedAspectRatioEmbedding(Module):
    """Reference :102 — per-aspect-ratio tile embeddings, optionally gated."""

    def __init__(self, config: MllamaVisionConfig, is_gated=True, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.max_num_tiles = config.max_num_tiles
        self.hidden_size = config.hidden_size
        self.is_gated = is_gated
        self.embedding = Embedding(config.max_aspect_ratio_id + 1,
                                   config.max_num_tiles * config.hidden_size,
                                   dtype=dtype, param_dtype=param_dtype,
                                   embedding_init=normal_init(config.initializer_range))

    def init(self, rng):
        params = super().init(rng)
        if self.is_gated:
            params["gate"] = jnp.zeros((1,), self.param_dtype)
        return params

    def __call__(self, params, hidden, aspect_ratio_ids):  # hidden [BM, T, P, D]
        emb = self.embedding(params["embedding"], aspect_ratio_ids)  # [BM, T*D]
        emb = emb.reshape(-1, self.max_num_tiles, 1, self.hidden_size)
        if self.is_gated:
            emb = emb * jnp.tanh(params["gate"].astype(self.dtype))
        return hidden + emb


class MllamaPrecomputedPositionEmbedding(Module):
    """Reference :125 — gated blend of per-patch and per-tile position tables."""

    def __init__(self, config: MllamaVisionConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.max_num_tiles = config.max_num_tiles
        self.num_patches = (config.image_size // config.patch_size) ** 2 + 1
        self.hidden_size = config.hidden_size
        self.tile_embedding = Embedding(
            config.max_aspect_ratio_id + 1,
            config.max_num_tiles * self.num_patches * config.hidden_size,
            dtype=dtype, param_dtype=param_dtype,
            embedding_init=normal_init(config.initializer_range))

    def init(self, rng):
        params = super().init(rng)
        params["gate"] = jnp.zeros((1,), self.param_dtype)
        scale = self.hidden_size ** -0.5
        params["embedding"] = (
            jax.random.normal(rng, (self.num_patches, self.hidden_size), jnp.float32)
            * scale).astype(self.param_dtype)
        return params

    def __call__(self, params, hidden, aspect_ratio_ids):  # [BM, T, P, D]
        gate = jnp.tanh(params["gate"].astype(self.dtype))
        pos = params["embedding"].astype(self.dtype)
        hidden = hidden + ((1.0 - gate) * pos)[None, None]
        tile = self.tile_embedding(params["tile_embedding"], aspect_ratio_ids)
        tile = tile.reshape(hidden.shape[0], self.max_num_tiles,
                            self.num_patches, self.hidden_size)
        return hidden + gate * tile


class MllamaVisionAttention(Module):
    def __init__(self, config: MllamaVisionConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.num_heads = config.attention_heads
        self.head_dim = config.hidden_size // config.attention_heads
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        e = config.hidden_size
        self.q_proj = Linear(e, e, False, **kw)
        self.k_proj = Linear(e, e, False, **kw)
        self.v_proj = Linear(e, e, False, **kw)
        self.o_proj = Linear(e, e, False, **kw)

    def __call__(self, params, hidden, bias):
        b, s, _ = hidden.shape
        q = self.q_proj(params["q_proj"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        k = self.k_proj(params["k_proj"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        v = self.v_proj(params["v_proj"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        out = eager_attention(q, k, v, bias, is_causal=False,
                              scale=self.head_dim ** -0.5)
        return self.o_proj(params["o_proj"], out.reshape(b, s, -1))


class MllamaVisionMLP(Module):
    def __init__(self, config: MllamaVisionConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.fc1 = Linear(config.hidden_size, config.intermediate_size, True, **kw)
        self.fc2 = Linear(config.intermediate_size, config.hidden_size, True, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, x):
        return self.fc2(params["fc2"], self.act(self.fc1(params["fc1"], x)))


class MllamaVisionEncoderLayer(Module):
    """Reference :272 — pre-LN block, optionally tanh-gated (global encoder)."""

    def __init__(self, config: MllamaVisionConfig, is_gated: bool, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.is_gated = is_gated
        self.self_attn = MllamaVisionAttention(config, **kw)
        self.mlp = MllamaVisionMLP(config, **kw)
        self.input_layernorm = LayerNorm(config.hidden_size, config.norm_eps, **kw)
        self.post_attention_layernorm = LayerNorm(config.hidden_size, config.norm_eps, **kw)

    def init(self, rng):
        params = super().init(rng)
        if self.is_gated:
            import math

            params["gate_attn"] = jnp.full((1,), math.pi / 4, self.param_dtype)
            params["gate_ffn"] = jnp.full((1,), math.pi / 4, self.param_dtype)
        return params

    def __call__(self, params, hidden, bias):
        res = hidden
        h = self.self_attn(params["self_attn"],
                           self.input_layernorm(params["input_layernorm"], hidden), bias)
        if self.is_gated:
            h = jnp.tanh(params["gate_attn"].astype(self.dtype)) * h
        hidden = res + h
        res = hidden
        h = self.mlp(params["mlp"],
                     self.post_attention_layernorm(params["post_attention_layernorm"], hidden))
        if self.is_gated:
            h = jnp.tanh(params["gate_ffn"].astype(self.dtype)) * h
        return res + h


class MllamaVisionEncoder(Module):
    def __init__(self, config, num_layers, is_gated, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.layers = [MllamaVisionEncoderLayer(config, is_gated, dtype=dtype,
                                                param_dtype=param_dtype)
                       for _ in range(num_layers)]

    def __call__(self, params, hidden, bias):
        states = []
        for i, layer in enumerate(self.layers):
            hidden = layer(params["layers"][str(i)], hidden, bias)
            states.append(hidden)  # reference records POST-layer outputs (:355)
        return hidden, states


class MllamaVisionModel(Module):
    """Reference :812 — tiled patches + gated embeddings -> local encoder ->
    global encoder; output concatenates final + intermediate features."""

    def __init__(self, config: MllamaVisionConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.image_size = config.image_size
        self.patch_size = config.patch_size
        self.hidden_size = config.hidden_size
        self.num_patches = (self.image_size // self.patch_size) ** 2 + 1
        self.gated_positional_embedding = MllamaPrecomputedPositionEmbedding(config, **kw)
        self.pre_tile_positional_embedding = MllamaPrecomputedAspectRatioEmbedding(
            config, True, **kw)
        self.post_tile_positional_embedding = MllamaPrecomputedAspectRatioEmbedding(
            config, True, **kw)
        self.layernorm_pre = LayerNorm(config.hidden_size, 1e-5, **kw)
        self.layernorm_post = LayerNorm(config.hidden_size, 1e-5, **kw)
        self.transformer = MllamaVisionEncoder(config, config.num_hidden_layers, False, **kw)
        self.global_transformer = MllamaVisionEncoder(config, config.num_global_layers, True, **kw)

    def init(self, rng):
        params = super().init(rng)
        k1, k2 = jax.random.split(rng)
        scale = self.hidden_size ** -0.5
        params["class_embedding"] = (
            scale * jax.random.normal(k1, (self.hidden_size,), jnp.float32)
        ).astype(self.param_dtype)
        p, c = self.patch_size, self.config.num_channels
        params["patch_embedding"] = {
            "weight": normal_init(0.02)(k2, (self.hidden_size, c, p, p), self.param_dtype)}
        return params

    def _patch_embed(self, params, pixel_values):  # [N, C, H, W] -> [N, P, D]
        n, c, hh, ww = pixel_values.shape
        p = self.patch_size
        gh, gw = hh // p, ww // p
        x = pixel_values.reshape(n, c, gh, p, gw, p)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(n, gh * gw, c * p * p)
        w = params["patch_embedding"]["weight"].astype(self.dtype).reshape(self.hidden_size, -1)
        return jnp.dot(x.astype(self.dtype), w.T)

    def __call__(self, params, pixel_values, aspect_ratio_ids, aspect_ratio_mask):
        b, m, t, c, hh, ww = pixel_values.shape
        pix = pixel_values.reshape(b * m * t, c, hh, ww)
        ar_ids = aspect_ratio_ids.reshape(b * m)
        hidden = self._patch_embed(params, pix)  # [BMT, P-1, D]
        dim = hidden.shape[-1]
        hidden = hidden.reshape(b * m, t, -1, dim)
        hidden = self.pre_tile_positional_embedding(
            params["pre_tile_positional_embedding"], hidden, ar_ids)
        # class token
        hidden = hidden.reshape(b * m * t, -1, dim)
        cls = jnp.broadcast_to(params["class_embedding"].astype(self.dtype),
                               (hidden.shape[0], 1, dim))
        hidden = jnp.concatenate([cls, hidden], axis=1)
        num_patches = hidden.shape[1]
        hidden = hidden.reshape(b * m, t, num_patches, dim)
        hidden = self.gated_positional_embedding(
            params["gated_positional_embedding"], hidden, ar_ids)
        hidden = self.layernorm_pre(params["layernorm_pre"], hidden)

        pad = (8 - num_patches % 8) % 8
        if pad:
            hidden = jnp.pad(hidden, ((0, 0), (0, 0), (0, pad), (0, 0)))
        tgt = num_patches + pad

        # aspect-ratio attention bias (reference :75): -inf exactly where BOTH
        # positions are invalid (outer product of inverted validity)
        am = aspect_ratio_mask.reshape(b * m, t).astype(jnp.float32)
        valid = jnp.broadcast_to(am[:, :, None], (b * m, t, tgt)).copy()
        if pad:
            valid = valid.at[:, :, -pad:].set(0.0)
        inv = (1.0 - valid).reshape(b * m, t * tgt)
        bias = (inv[:, :, None] * inv[:, None, :]) * NEG  # [BM, L, L]
        bias = bias[:, None]  # [BM, 1, L, L]

        hidden = hidden.reshape(b * m, t * tgt, dim)
        hidden, states = self.transformer(params["transformer"], hidden, bias)
        hidden = self.layernorm_post(params["layernorm_post"], hidden)
        hidden = hidden.reshape(b * m, t, tgt, dim)
        hidden = self.post_tile_positional_embedding(
            params["post_tile_positional_embedding"], hidden, ar_ids)
        hidden = hidden.reshape(b * m, t * tgt, dim)
        hidden, _ = self.global_transformer(params["global_transformer"], hidden, bias)

        hidden = hidden.reshape(b * m, t, tgt, dim)[:, :, :num_patches]
        inter = jnp.stack([states[i] for i in self.config.intermediate_layers_indices],
                          axis=-1)  # [BM, L, D, n]
        inter = inter.reshape(b * m, t, tgt, -1)[:, :, :num_patches]
        out = jnp.concatenate([hidden, inter], axis=-1)
        return out.reshape(b, m, t, num_patches, -1)  # [B, M, T, P, vision_output_dim]


# ------------------------------------------------------------------ cache ---


@partial(jax.tree_util.register_dataclass,
         data_fields=["self_cache", "cross_keys", "cross_values", "cross_bias_row"],
         meta_fields=[])
@dataclass(frozen=True)
class MllamaCache:
    """Self-attention KV buffers + prefill-computed cross K/V and the decode
    cross-bias row (reference keeps cross K/V in DynamicCache, :437)."""

    self_cache: StaticKVCache
    cross_keys: tuple      # per cross layer [B, KVH, Nv, D], () before prefill
    cross_values: tuple
    cross_bias_row: Optional[jnp.ndarray]  # [B, 1, 1, Nv] or None

    @property
    def max_len(self):
        return self.self_cache.max_len

    @property
    def has_cross(self):
        return len(self.cross_keys) > 0


# ------------------------------------------------------------------- text ---


class MllamaTextCrossAttention(Module):
    """Reference :384 — GQA cross-attention with per-head q/k RMSNorm."""

    def __init__(self, config: MllamaTextConfig, layer_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.num_heads = config.num_attention_heads
        self.num_kv_heads = config.num_key_value_heads
        self.head_dim = config.hidden_size // config.num_attention_heads
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        h = config.hidden_size
        self.q_proj = Linear(h, self.num_heads * self.head_dim, False, **kw)
        self.k_proj = Linear(h, self.num_kv_heads * self.head_dim, False, **kw)
        self.v_proj = Linear(h, self.num_kv_heads * self.head_dim, False, **kw)
        self.o_proj = Linear(self.num_heads * self.head_dim, h, False, **kw)
        self.q_norm = RMSNorm(self.head_dim, config.rms_norm_eps, dtype=dtype,
                              param_dtype=param_dtype)
        self.k_norm = RMSNorm(self.head_dim, config.rms_norm_eps, dtype=dtype,
                              param_dtype=param_dtype)

    def compute_kv(self, params, cross_states):  # [B, Nv, H] -> 2x [B, Nv, KVH, D]
        b, nv, _ = cross_states.shape
        k = self.k_proj(params["k_proj"], cross_states).reshape(b, nv, self.num_kv_heads, self.head_dim)
        v = self.v_proj(params["v_proj"], cross_states).reshape(b, nv, self.num_kv_heads, self.head_dim)
        k = self.k_norm(params["k_norm"], k)
        return k, v

    def __call__(self, params, hidden, k, v, bias):
        b, s, _ = hidden.shape
        q = self.q_proj(params["q_proj"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        q = self.q_norm(params["q_norm"], q)
        out = eager_attention(q, k, v, bias, is_causal=False,
                              scale=self.head_dim ** -0.5)
        return self.o_proj(params["o_proj"], out.reshape(b, s, -1))


class MllamaCrossAttentionDecoderLayer(Module):
    """Reference :655 — tanh-gated cross-attention block."""

    def __init__(self, config: MllamaTextConfig, layer_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.cross_attn = MllamaTextCrossAttention(config, layer_idx, **kw)
        self.input_layernorm = RMSNorm(config.hidden_size, config.rms_norm_eps, **kw)
        self.post_attention_layernorm = RMSNorm(config.hidden_size, config.rms_norm_eps, **kw)
        self.mlp = LlamaMLP(config, **kw)

    def init(self, rng):
        params = super().init(rng)
        params["cross_attn_attn_gate"] = jnp.zeros((1,), self.param_dtype)
        params["cross_attn_mlp_gate"] = jnp.zeros((1,), self.param_dtype)
        return params

    def __call__(self, params, hidden, k, v, bias, full_row):
        res = hidden
        h = self.cross_attn(params["cross_attn"],
                            self.input_layernorm(params["input_layernorm"], hidden),
                            k, v, bias)
        hidden = res + jnp.tanh(params["cross_attn_attn_gate"].astype(self.dtype)) * h
        res = hidden
        h = self.mlp(params["mlp"],
                     self.post_attention_layernorm(params["post_attention_layernorm"], hidden))
        if full_row is not None:
            h = full_row[:, 0] * h  # [B, S, 1] zeroes rows that see no image
        return res + jnp.tanh(params["cross_attn_mlp_gate"].astype(self.dtype)) * h


class MllamaTextModel(Module):
    """Reference :1013 — llama decoder with interleaved cross-attn layers.
    ``embed_tokens`` has vocab_size + 8 rows (reference :1022)."""

    def __init__(self, config: MllamaTextConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embed_tokens = Embedding(config.vocab_size + 8, config.hidden_size,
                                      embedding_init=normal_init(config.initializer_range), **kw)
        self.cross_attention_layers = list(config.cross_attention_layers)
        self.layers = [
            (MllamaCrossAttentionDecoderLayer(config, i, **kw)
             if i in self.cross_attention_layers
             else LlamaDecoderLayer(config, i, **kw))
            for i in range(config.num_hidden_layers)
        ]
        self.norm = RMSNorm(config.hidden_size, config.rms_norm_eps, **kw)
        self.inv_freq, self.attention_scaling = rope_inv_freq(config)

    def __call__(self, params, input_ids=None, attention_mask=None, position_ids=None,
                 past_key_values: Optional[MllamaCache] = None, cache_position=0,
                 inputs_embeds=None, cross_states=None, cross_bias=None,
                 full_row=None, output_hidden_states=False):
        if inputs_embeds is None:
            inputs_embeds = self.embed_tokens(params["embed_tokens"], input_ids)
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
        attn_args = {"q_positions": q_positions, "kv_valid": kv_valid,
                     "is_causal": True, "sliding_window": None}

        self_cache = past_key_values.self_cache if past_key_values is not None else None
        new_cross_k, new_cross_v = [], []
        cross_idx = 0
        all_hidden = [] if output_hidden_states else None
        for i, layer in enumerate(self.layers):
            if output_hidden_states:
                all_hidden.append(hidden)
            lp = params["layers"][str(i)]
            if i in self.cross_attention_layers:
                if cross_states is not None:
                    k, v = layer.cross_attn.compute_kv(lp["cross_attn"], cross_states)
                    if past_key_values is not None:
                        new_cross_k.append(jnp.swapaxes(k, 1, 2))  # store [B, KVH, Nv, D]
                        new_cross_v.append(jnp.swapaxes(v, 1, 2))
                    hidden = layer(lp, hidden, k, v, cross_bias, full_row)
                elif past_key_values is not None and past_key_values.has_cross:
                    k = jnp.swapaxes(past_key_values.cross_keys[cross_idx], 1, 2)
                    v = jnp.swapaxes(past_key_values.cross_values[cross_idx], 1, 2)
                    hidden = layer(lp, hidden, k.astype(self.dtype), v.astype(self.dtype),
                                   past_key_values.cross_bias_row, None)
                # else: text-only — skip the cross layer (reference :1136)
                cross_idx += 1
            else:
                hidden, self_cache = layer(lp, hidden, cos, sin, attn_args,
                                           self_cache, cache_position)
        hidden = self.norm(params["norm"], hidden)
        if output_hidden_states:
            all_hidden.append(hidden)

        new_cache = None
        if past_key_values is not None:
            if cross_states is not None:
                last_bias = (cross_bias[:, :, -1:, :] if cross_bias is not None
                             else jnp.zeros((b, 1, 1, cross_states.shape[1]), jnp.float32))
                new_cache = MllamaCache(self_cache, tuple(new_cross_k),
                                        tuple(new_cross_v), last_bias)
            else:
                new_cache = replace(past_key_values, self_cache=self_cache)
        return BaseModelOutputWithPast(
            last_hidden_state=hidden, past_key_values=new_cache,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None)


# -------------------------------------------------------------- composite ---


class MllamaModel(Module):
    def __init__(self, config: MllamaConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.vision_model = MllamaVisionModel(config.vision_config, **kw)
        self.language_model = MllamaTextModel(config.text_config, **kw)
        self.multi_modal_projector = Linear(
            config.vision_config.vision_output_dim, config.text_config.hidden_size,
            True, kernel_init=normal_init(0.02), **kw)
        self.num_patches = self.vision_model.num_patches

    def prepare_cross_inputs(self, params, pixel_values, aspect_ratio_ids,
                             aspect_ratio_mask, cross_attention_mask, text_len):
        """-> (cross_states [B, Nv, H], cross_bias [B,1,T,Nv] or None,
        full_row [B,1,T,1] or None) replicating reference :47-73 arithmetic."""
        feats = self.vision_model(params["vision_model"], pixel_values,
                                  aspect_ratio_ids, aspect_ratio_mask)
        b = feats.shape[0]
        proj = self.multi_modal_projector(params["multi_modal_projector"], feats)
        cross_states = proj.reshape(b, -1, proj.shape[-1])  # [B, M*T*P, H]
        if cross_attention_mask is None:
            return cross_states, None, None
        cm = cross_attention_mask.astype(jnp.float32)  # [B, T, M, Ti]
        if cm.shape[1] < text_len:  # left-padded prompt bucket: pad rows see nothing
            cm = jnp.pad(cm, ((0, 0), (text_len - cm.shape[1], 0), (0, 0), (0, 0)))
        cm = jnp.repeat(cm, self.num_patches, axis=3).reshape(b, text_len, -1)[:, None]
        bias = (1.0 - cm) * NEG  # [B, 1, T, Nv]
        full_row = (bias != NEG).any(axis=-1).astype(jnp.float32)[..., None]
        bias = bias * full_row
        return cross_states, bias, full_row

    def __call__(self, params, input_ids=None, pixel_values=None,
                 aspect_ratio_mask=None, aspect_ratio_ids=None, attention_mask=None,
                 cross_attention_mask=None, position_ids=None, past_key_values=None,
                 cache_position=0, inputs_embeds=None, output_hidden_states=False):
        cross_states = cross_bias = full_row = None
        if pixel_values is not None:
            text_len = input_ids.shape[1] if input_ids is not None else inputs_embeds.shape[1]
            cross_states, cross_bias, full_row = self.prepare_cross_inputs(
                params, pixel_values, aspect_ratio_ids, aspect_ratio_mask,
                cross_attention_mask, text_len)
        return self.language_model(
            params["language_model"], input_ids, attention_mask, position_ids,
            past_key_values, cache_position, inputs_embeds, cross_states,
            cross_bias, full_row, output_hidden_states)


class MllamaPreTrainedModel(PreTrainedModel):
    config_class = MllamaConfig
    base_model_prefix = "model"


class MllamaForConditionalGeneration(MllamaPreTrainedModel, GenerationMixin):
    """Reference :1398."""

    _prefill_input_names = ("pixel_values", "aspect_ratio_ids", "aspect_ratio_mask",
                            "cross_attention_mask")
    _weight_rules = (
        WeightRule(pattern=r"^language_model\.model\.", rename="model.language_model."),
        WeightRule(pattern=r"^language_model\.lm_head\.", rename="lm_head."),
        WeightRule(pattern=r"^vision_model\.", rename="model.vision_model."),
        WeightRule(pattern=r"^multi_modal_projector\.", rename="model.multi_modal_projector."),
    )

    def __init__(self, config: MllamaConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.model = MllamaModel(config, dtype=self.dtype, param_dtype=self.param_dtype)
        tc = config.text_config
        self.lm_head = Linear(tc.hidden_size, tc.vocab_size, False, dtype=self.dtype,
                              param_dtype=self.param_dtype, kernel_init=normal_init(0.02))

    def get_input_embedding_path(self):
        return "model.language_model.embed_tokens.weight"

    def __call__(self, params, input_ids=None, pixel_values=None, aspect_ratio_mask=None,
                 aspect_ratio_ids=None, attention_mask=None, cross_attention_mask=None,
                 position_ids=None, past_key_values=None, cache_position=0,
                 inputs_embeds=None, labels=None, logits_to_keep: int = 0,
                 output_hidden_states=False, **kwargs) -> CausalLMOutputWithPast:
        outputs = self.model(params["model"], input_ids, pixel_values, aspect_ratio_mask,
                             aspect_ratio_ids, attention_mask, cross_attention_mask,
                             position_ids, past_key_values, cache_position, inputs_embeds,
                             output_hidden_states)
        hidden = outputs.last_hidden_state
        if logits_to_keep:
            hidden = hidden[:, -logits_to_keep:, :]
        logits = self.lm_head(params["lm_head"], hidden)
        loss = None
        if labels is not None:
            from ...loss import for_causal_lm_loss

            loss = for_causal_lm_loss(logits, labels, self.config.text_config.vocab_size)
        return CausalLMOutputWithPast(loss=loss, logits=logits,
                                      past_key_values=outputs.past_key_values,
                                      hidden_states=outputs.hidden_states)

    def init_cache(self, batch_size: int, max_len: int, dtype=None,
                   implementation: str = "static"):
        tc = self.config.text_config
        self_cache = init_static_cache(
            num_layers=tc.num_hidden_layers, batch_size=batch_size, max_len=max_len,
            num_kv_heads=tc.num_key_value_heads,
            head_dim=tc.hidden_size // tc.num_attention_heads,
            dtype=dtype or self.dtype,
            layer_windows=(None,) * tc.num_hidden_layers, layout="bhsd")
        return MllamaCache(self_cache, (), (), None)
