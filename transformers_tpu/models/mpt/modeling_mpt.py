"""MPT decoder, TPU-native.

Semantics match reference src/transformers/models/mpt/modeling_mpt.py:
MPT-style alibi (:42-62 ``build_mpt_alibi_tensor`` — ceil-power-of-two slope
table interleaved via ``[1::2] + [::2]``, bias ``slope * (j - (K-1))``),
fused bias-free ``Wqkv`` split into thirds (:96-103), optional
``clip_qkv`` clamping (:97), bias-free LayerNorms (:163-172 ``bias=None``),
4x GELU-exact MLP ``up_proj``/``down_proj`` (:137-152), no positional
embeddings, tied lm_head. Checkpoint layout:
``transformer.{wte,blocks.N.{norm_1,attn.{Wqkv,out_proj},norm_2,
ffn.{up_proj,down_proj}},norm_f}``.

The alibi bias here uses kv-slot index minus the last slot index — equal to
the reference up to a per-row constant, which softmax cancels exactly
(reference slices ``alibi[..., -K:]`` from a max_seq_len table; see :49).
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ...cache_utils import StaticKVCache, cache_from_config
from ...core.module import Embedding, LayerNorm, Linear, Module, normal_init
from ...generation.utils import GenerationMixin
from ...modeling_outputs import BaseModelOutputWithPast, CausalLMOutputWithPast
from ...modeling_utils import PreTrainedModel
from ...ops.activations import gelu_exact
from ...ops.attention import get_attention_fn
from ...ops.masks import causal_mask_bool, to_additive
from .configuration_mpt import MptConfig


def mpt_alibi_slopes(num_heads: int, alibi_bias_max: int = 8) -> np.ndarray:
    """reference build_mpt_alibi_tensor (:42-62) slope schedule."""
    n_pow2 = 2 ** math.ceil(math.log2(num_heads))
    base = np.arange(1, n_pow2 + 1, dtype=np.float64) * (alibi_bias_max / n_pow2)
    slopes = 1.0 / np.power(2, base)
    if n_pow2 != num_heads:
        slopes = np.concatenate([slopes[1::2], slopes[::2]])[:num_heads]
    return slopes.astype(np.float32)


def build_mpt_alibi_bias(kv_len: int, num_heads: int, alibi_bias_max: int = 8) -> jnp.ndarray:
    """[1, H, 1, K] additive alibi: slope * (j - (K-1))."""
    slopes = jnp.asarray(mpt_alibi_slopes(num_heads, alibi_bias_max))
    pos = jnp.arange(1 - kv_len, 1, dtype=jnp.float32)
    return slopes[None, :, None, None] * pos[None, None, None, :]


class MptAttention(Module):
    def __init__(self, config: MptConfig, layer_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.layer_idx = layer_idx
        self.num_heads = config.n_heads
        self.head_dim = config.d_model // config.n_heads
        self.scale = config.attn_config.softmax_scale or self.head_dim**-0.5
        self.clip_qkv = config.attn_config.clip_qkv
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.Wqkv = Linear(config.d_model, 3 * config.d_model, False, **kw)
        self.out_proj = Linear(config.d_model, config.d_model, False, **kw)

    def __call__(self, params, hidden, attn_args, alibi_bias,
                 cache: Optional[StaticKVCache], cache_position):
        b, s, e = hidden.shape
        qkv = self.Wqkv(params["Wqkv"], hidden)
        if self.clip_qkv:
            qkv = jnp.clip(qkv, -self.clip_qkv, self.clip_qkv)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, s, self.num_heads, self.head_dim)
        k = k.reshape(b, s, self.num_heads, self.head_dim)
        v = v.reshape(b, s, self.num_heads, self.head_dim)
        if cache is not None:
            cache = cache.update(self.layer_idx, k, v, cache_position)
            k, v = cache.layer(self.layer_idx)
            k = k.astype(self.dtype)
            v = v.astype(self.dtype)
        kwargs = dict(attn_args)
        mask = causal_mask_bool(kwargs.pop("q_positions"), kwargs.pop("kv_valid"))
        bias = to_additive(mask, jnp.float32)
        if alibi_bias is not None:
            bias = bias + alibi_bias
        kwargs["bias"] = bias
        kwargs.pop("is_causal", None)
        attn_fn = get_attention_fn(self.config.attn_implementation)
        out = attn_fn(q, k, v, scale=self.scale, **kwargs)
        return self.out_proj(params["out_proj"], out.reshape(b, s, e)), cache


class MptMLP(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.up_proj = Linear(config.d_model, 4 * config.d_model, False, **kw)
        self.down_proj = Linear(4 * config.d_model, config.d_model, False, **kw)

    def __call__(self, params, x):
        return self.down_proj(params["down_proj"], gelu_exact(self.up_proj(params["up_proj"], x)))


class MptBlock(Module):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.norm_1 = LayerNorm(config.d_model, config.layer_norm_epsilon, use_bias=False, **kw)
        self.attn = MptAttention(config, layer_idx, **kw)
        self.norm_2 = LayerNorm(config.d_model, config.layer_norm_epsilon, use_bias=False, **kw)
        self.ffn = MptMLP(config, **kw)

    def __call__(self, params, hidden, attn_args, alibi_bias, cache, cache_position):
        h, cache = self.attn(params["attn"], self.norm_1(params["norm_1"], hidden),
                             attn_args, alibi_bias, cache, cache_position)
        hidden = hidden + h
        h = self.ffn(params["ffn"], self.norm_2(params["norm_2"], hidden))
        return hidden + h, cache


class MptModel(Module):
    def __init__(self, config: MptConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.wte = Embedding(config.vocab_size, config.d_model,
                             embedding_init=normal_init(config.initializer_range), **kw)
        self.blocks = [MptBlock(config, i, **kw) for i in range(config.n_layers)]
        self.norm_f = LayerNorm(config.d_model, config.layer_norm_epsilon, use_bias=False, **kw)

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
            inputs_embeds = self.wte(params["wte"], input_ids)
        hidden = inputs_embeds
        b, s, _ = hidden.shape

        kv_len = past_key_values.max_len if past_key_values is not None else s
        q_positions = jnp.asarray(cache_position, jnp.int32) + jnp.arange(s, dtype=jnp.int32)[None, :]
        q_positions = jnp.broadcast_to(q_positions, (b, s))
        kv_valid = attention_mask if attention_mask is not None else jnp.ones((b, kv_len), jnp.int32)
        attn_args = {"q_positions": q_positions, "kv_valid": kv_valid, "is_causal": True}
        alibi_bias = (build_mpt_alibi_bias(kv_len, self.config.n_heads,
                                           self.config.attn_config.alibi_bias_max)
                      if self.config.attn_config.alibi else None)

        all_hidden = [] if output_hidden_states else None
        cache = past_key_values
        for i, block in enumerate(self.blocks):
            if output_hidden_states:
                all_hidden.append(hidden)
            hidden, cache = block(params["blocks"][str(i)], hidden, attn_args, alibi_bias,
                                  cache, cache_position)
        hidden = self.norm_f(params["norm_f"], hidden)
        if output_hidden_states:
            all_hidden.append(hidden)
        return BaseModelOutputWithPast(
            last_hidden_state=hidden, past_key_values=cache,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None,
        )


class MptPreTrainedModel(PreTrainedModel):
    config_class = MptConfig
    base_model_prefix = "transformer"


class MptForCausalLM(MptPreTrainedModel, GenerationMixin):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.transformer = MptModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def get_input_embedding_path(self):
        return "transformer.wte.weight"

    def compute_logits(self, params, hidden):
        return self.transformer.wte.attend(params["transformer"]["wte"], hidden)

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
        logits = self.compute_logits(params, hidden)
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


class MptModelStandalone(MptPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.transformer = MptModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.transformer(params["transformer"], *args, **kwargs)
