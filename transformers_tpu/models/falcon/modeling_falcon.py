"""Falcon decoder, TPU-native.

Semantics match reference src/transformers/models/falcon/modeling_falcon.py:
fused ``query_key_value`` with THREE packing schemes (:264-282 —
new_decoder_architecture grouped-per-kv with k/v broadcast to all heads,
multi_query single-kv, classic per-head interleaved), rotary OR alibi
positions (:160 build_alibi_tensor), parallel-attention residual variants
(:549-630 — ln_attn/ln_mlp dual norms for the new architecture, shared
input_layernorm for parallel_attn, sequential norms otherwise), GELU MLP
(:531), checkpoint layout ``transformer.{word_embeddings,h.N,ln_f}``.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ...cache_utils import StaticKVCache, cache_from_config
from ...core.module import Embedding, LayerNorm, Linear, Module, normal_init
from ...generation.utils import GenerationMixin
from ...modeling_outputs import BaseModelOutputWithPast, CausalLMOutputWithPast
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...ops.attention import get_attention_fn
from ...ops.masks import causal_mask_bool, to_additive
from ...ops.rope import apply_rotary_pos_emb, compute_cos_sin, rope_inv_freq
from .configuration_falcon import FalconConfig


def alibi_slopes(num_heads: int) -> np.ndarray:
    """Per-head alibi slopes (reference modeling_falcon.py:160-178): powers of
    2**(-8/n) for the closest power of two n <= H, extended with odd powers of
    the doubled base when H is not a power of two."""
    closest = 2 ** int(np.floor(np.log2(num_heads)))
    base = 2.0 ** (-(2.0 ** -(np.log2(closest) - 3)))
    powers = np.arange(1, 1 + closest)
    slopes = base**powers
    if closest != num_heads:
        extra_base = 2.0 ** (-(2.0 ** -(np.log2(2 * closest) - 3)))
        num_remaining = min(closest, num_heads - closest)
        extra_powers = np.arange(1, 1 + 2 * num_remaining, 2)
        slopes = np.concatenate([slopes, extra_base**extra_powers])
    return slopes.astype(np.float32)


def build_alibi_bias(attention_mask: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """[B, H, 1, K] additive alibi (reference build_alibi_tensor :160): slope
    * mask-derived position, slopes rounded through bfloat16 like the
    reference (they are exact powers of two, so the cast is lossless)."""
    slopes = jnp.asarray(alibi_slopes(num_heads))[None, :, None]  # [1, H, 1]
    arange = ((jnp.cumsum(attention_mask, axis=-1) - 1) * attention_mask)[:, None, :]
    return (slopes * arange.astype(jnp.float32))[:, :, None, :]  # [B, H, 1, K]


class FalconAttention(Module):
    def __init__(self, config: FalconConfig, layer_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.layer_idx = layer_idx
        self.num_heads = config.num_attention_heads
        self.head_dim = config.head_dim
        self.scale = self.head_dim**-0.5
        self.new_arch = config.new_decoder_architecture
        self.multi_query = config.multi_query
        # kv heads inside the fused projection (pre-broadcast)
        self.num_kv = config.num_kv_heads if (self.new_arch or not self.multi_query) else 1
        if self.new_arch:
            qkv_out = (self.num_kv * 2 + self.num_heads) * self.head_dim
        elif self.multi_query:
            qkv_out = config.hidden_size + 2 * self.head_dim
        else:
            qkv_out = 3 * config.hidden_size
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.query_key_value = Linear(config.hidden_size, qkv_out, config.bias, **kw)
        self.dense = Linear(config.hidden_size, config.hidden_size, config.bias, **kw)

    def split_qkv(self, fused):
        """reference _split_heads (:264): returns BSHD q/k/v; k/v broadcast to
        all heads for the new architecture (the reference caches them
        broadcast)."""
        b, s, _ = fused.shape
        if self.new_arch:
            qkv = fused.reshape(b, s, -1, self.num_heads // self.num_kv + 2, self.head_dim)
            q = qkv[:, :, :, :-2]
            k = jnp.broadcast_to(qkv[:, :, :, -2:-1], q.shape)
            v = jnp.broadcast_to(qkv[:, :, :, -1:], q.shape)
            flat = lambda x: x.reshape(b, s, self.num_heads, self.head_dim)
            return flat(q), flat(k), flat(v)
        if self.multi_query:
            qkv = fused.reshape(b, s, self.num_heads + 2, self.head_dim)
            return qkv[:, :, :-2], qkv[:, :, -2:-1], qkv[:, :, -1:]
        qkv = fused.reshape(b, s, self.num_heads, 3, self.head_dim)
        return qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]

    def __call__(self, params, hidden, cos, sin, attn_args, alibi_bias,
                 cache: Optional[StaticKVCache], cache_position):
        b, s, e = hidden.shape
        q, k, v = self.split_qkv(self.query_key_value(params["query_key_value"], hidden))
        if cos is not None:
            q, k = apply_rotary_pos_emb(q, k, cos, sin)
        if cache is not None:
            cache = cache.update(self.layer_idx, k, v, cache_position)
            k, v = cache.layer(self.layer_idx)
            k = k.astype(self.dtype)
            v = v.astype(self.dtype)
        attn_fn = get_attention_fn(self.config.attn_implementation)
        kwargs = dict(attn_args)
        if alibi_bias is not None:
            # Fold alibi into the additive mask bias, pre-scaled because the
            # reference scales (scores + alibi) together (:405-406). The
            # DOUBLING matches the reference exactly: FalconModel.forward
            # masked-fills scaled alibi into the 4D causal mask (:781-786)
            # AND the eager kernel adds the raw alibi again (:405), so the
            # effective contribution is 2·alibi·scale (verified numerically
            # against the snapshot).
            mask = causal_mask_bool(kwargs.pop("q_positions"), kwargs.pop("kv_valid"))
            bias = to_additive(mask, jnp.float32) + 2.0 * alibi_bias * self.scale
            kwargs.pop("is_causal", None)
            out = attn_fn(q, k, v, bias, scale=self.scale, **kwargs)
        else:
            out = attn_fn(q, k, v, scale=self.scale, **kwargs)
        return self.dense(params["dense"], out.reshape(b, s, e)), cache


class FalconMLP(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.dense_h_to_4h = Linear(config.hidden_size, config.ffn_hidden_size, config.bias, **kw)
        self.dense_4h_to_h = Linear(config.ffn_hidden_size, config.hidden_size, config.bias, **kw)
        self.act = get_activation(getattr(config, "activation", "gelu"))

    def __call__(self, params, x):
        return self.dense_4h_to_h(params["dense_4h_to_h"],
                                  self.act(self.dense_h_to_4h(params["dense_h_to_4h"], x)))


class FalconDecoderLayer(Module):
    """Norm wiring per reference :549-630."""

    def __init__(self, config: FalconConfig, layer_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.self_attention = FalconAttention(config, layer_idx, **kw)
        self.mlp = FalconMLP(config, **kw)
        num_ln = config.num_ln_in_parallel_attn
        if num_ln is None and config.new_decoder_architecture:
            num_ln = 2
        self.num_ln = num_ln
        if not config.parallel_attn:
            self.post_attention_layernorm = LayerNorm(config.hidden_size, config.layer_norm_epsilon, **kw)
            self.input_layernorm = LayerNorm(config.hidden_size, config.layer_norm_epsilon, **kw)
        elif config.new_decoder_architecture and num_ln == 2:
            self.ln_attn = LayerNorm(config.hidden_size, config.layer_norm_epsilon, **kw)
            self.ln_mlp = LayerNorm(config.hidden_size, config.layer_norm_epsilon, **kw)
        else:
            self.input_layernorm = LayerNorm(config.hidden_size, config.layer_norm_epsilon, **kw)

    def __call__(self, params, hidden, cos, sin, attn_args, alibi_bias, cache, cache_position):
        cfg = self.config
        residual = hidden
        if cfg.new_decoder_architecture and self.num_ln == 2:
            attn_ln_out = self.ln_attn(params["ln_attn"], hidden)
            mlp_ln_out = self.ln_mlp(params["ln_mlp"], hidden)
        else:
            attn_ln_out = self.input_layernorm(params["input_layernorm"], hidden)
            mlp_ln_out = attn_ln_out

        attn_out, cache = self.self_attention(
            params["self_attention"], attn_ln_out, cos, sin, attn_args, alibi_bias,
            cache, cache_position)

        if not cfg.new_decoder_architecture and not cfg.parallel_attn:
            residual = attn_out + residual
            mlp_ln_out = self.post_attention_layernorm(params["post_attention_layernorm"], residual)

        mlp_out = self.mlp(params["mlp"], mlp_ln_out)
        if cfg.new_decoder_architecture or cfg.parallel_attn:
            mlp_out = mlp_out + attn_out
        return mlp_out + residual, cache


class FalconModel(Module):
    def __init__(self, config: FalconConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.word_embeddings = Embedding(config.vocab_size, config.hidden_size,
                                         embedding_init=normal_init(config.initializer_range), **kw)
        self.h = [FalconDecoderLayer(config, i, **kw) for i in range(config.num_hidden_layers)]
        self.ln_f = LayerNorm(config.hidden_size, config.layer_norm_epsilon, **kw)
        if config.rotary:
            self.inv_freq, self.attention_scaling = rope_inv_freq(config)

    def __call__(
        self,
        params,
        input_ids=None,
        attention_mask=None,
        position_ids=None,
        past_key_values: Optional[StaticKVCache] = None,
        cache_position=0,
        inputs_embeds=None,
        output_hidden_states: bool = False,
    ) -> BaseModelOutputWithPast:
        if inputs_embeds is None:
            inputs_embeds = self.word_embeddings(params["word_embeddings"], input_ids)
        hidden = inputs_embeds
        b, s, _ = hidden.shape
        if position_ids is None:
            position_ids = jnp.arange(s, dtype=jnp.int32)[None, :] + jnp.asarray(cache_position, jnp.int32)
            position_ids = jnp.broadcast_to(position_ids, (b, s))
        if self.config.rotary:
            cos, sin = compute_cos_sin(position_ids, self.inv_freq, self.attention_scaling, dtype=self.dtype)
        else:
            cos = sin = None

        kv_len = past_key_values.max_len if past_key_values is not None else s
        q_positions = jnp.asarray(cache_position, jnp.int32) + jnp.arange(s, dtype=jnp.int32)[None, :]
        q_positions = jnp.broadcast_to(q_positions, (b, s))
        kv_valid = attention_mask if attention_mask is not None else jnp.ones((b, kv_len), jnp.int32)
        attn_args = {"q_positions": q_positions, "kv_valid": kv_valid, "is_causal": True}
        alibi_bias = (build_alibi_bias(kv_valid, self.config.num_attention_heads)
                      if self.config.alibi else None)

        all_hidden = [] if output_hidden_states else None
        cache = past_key_values
        for i, layer in enumerate(self.h):
            if output_hidden_states:
                all_hidden.append(hidden)
            hidden, cache = layer(params["h"][str(i)], hidden, cos, sin, attn_args,
                                  alibi_bias, cache, cache_position)
        hidden = self.ln_f(params["ln_f"], hidden)
        if output_hidden_states:
            all_hidden.append(hidden)
        return BaseModelOutputWithPast(
            last_hidden_state=hidden, past_key_values=cache,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None,
        )


class FalconPreTrainedModel(PreTrainedModel):
    config_class = FalconConfig
    base_model_prefix = "transformer"


class FalconForCausalLM(FalconPreTrainedModel, GenerationMixin):
    _tied_weights_keys = ("lm_head.weight",)

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.transformer = FalconModel(config, dtype=self.dtype, param_dtype=self.param_dtype)
        if not config.tie_word_embeddings:
            self.lm_head = Linear(config.hidden_size, config.vocab_size, False, dtype=self.dtype,
                                  param_dtype=self.param_dtype,
                                  kernel_init=normal_init(config.initializer_range))

    def get_input_embedding_path(self):
        return "transformer.word_embeddings.weight"

    @property
    def tied_weights_keys(self):
        return ()

    def tie_weights(self, params):
        return params

    def __call__(
        self,
        params,
        input_ids=None,
        attention_mask=None,
        position_ids=None,
        past_key_values=None,
        cache_position=0,
        inputs_embeds=None,
        labels=None,
        logits_to_keep: int = 0,
        output_hidden_states: bool = False,
    ) -> CausalLMOutputWithPast:
        outputs = self.transformer(
            params["transformer"], input_ids, attention_mask, position_ids,
            past_key_values, cache_position, inputs_embeds, output_hidden_states,
        )
        hidden = outputs.last_hidden_state
        if logits_to_keep:
            hidden = hidden[:, -logits_to_keep:, :]
        if self.config.tie_word_embeddings:
            logits = self.transformer.word_embeddings.attend(
                params["transformer"]["word_embeddings"], hidden)
        else:
            logits = self.lm_head(params["lm_head"], hidden)
        loss = None
        if labels is not None:
            from ...loss import for_causal_lm_loss

            loss = for_causal_lm_loss(logits, labels, self.config.vocab_size)
        return CausalLMOutputWithPast(
            loss=loss, logits=logits, past_key_values=outputs.past_key_values,
            hidden_states=outputs.hidden_states,
        )

    def init_cache(self, batch_size: int, max_len: int, dtype=None,
                   implementation: str = "static"):
        return cache_from_config(self.config, batch_size, max_len, dtype or self.dtype,
                                 implementation=implementation)


class FalconModelStandalone(FalconPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.transformer = FalconModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.transformer(params["transformer"], *args, **kwargs)
