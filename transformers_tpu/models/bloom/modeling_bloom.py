"""BLOOM decoder, TPU-native.

Semantics match reference src/transformers/models/bloom/modeling_bloom.py:
alibi position bias built from the attention mask's cumulative sum (:45-91
``build_alibi_tensor``), fused ``query_key_value`` in the per-head
``[H, 3, D]`` layout (:203-221 ``_reshape``), LayerNorm on the word
embeddings (``word_embeddings_layernorm``, :427), optional
post-layernorm residuals (``apply_residual_connection_post_layernorm``,
:374-380), GELU-tanh 4x MLP (:115 ``bloom_gelu_forward``), tied lm_head.
Checkpoint layout: ``transformer.{word_embeddings,word_embeddings_layernorm,
h.N.{input_layernorm,self_attention.{query_key_value,dense},
post_attention_layernorm,mlp.{dense_h_to_4h,dense_4h_to_h}},ln_f}``.

Alibi enters the softmax unscaled while QK^T is scaled (reference :270-275
baddbmm with ``alpha=inv_norm_factor, beta=1``), so it is folded into the
additive mask bias handed to the shared attention kernel.
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
from ...ops.activations import gelu_new
from ...ops.attention import get_attention_fn
from ...ops.masks import causal_mask_bool, to_additive
from ..falcon.modeling_falcon import alibi_slopes
from .configuration_bloom import BloomConfig


def build_alibi_bias(attention_mask: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """[B, H, 1, K] additive alibi (reference modeling_bloom.py:45):
    slope * mask-cumsum position."""
    slopes = jnp.asarray(alibi_slopes(num_heads))[None, :, None]  # [1, H, 1]
    arange = ((jnp.cumsum(attention_mask, axis=-1) - 1) * attention_mask)[:, None, :]
    return (slopes * arange.astype(jnp.float32))[:, :, None, :]  # [B, H, 1, K]


class BloomAttention(Module):
    def __init__(self, config: BloomConfig, layer_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.layer_idx = layer_idx
        self.num_heads = config.n_head
        self.head_dim = config.hidden_size // config.n_head
        self.scale = self.head_dim**-0.5
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.query_key_value = Linear(config.hidden_size, 3 * config.hidden_size, True, **kw)
        self.dense = Linear(config.hidden_size, config.hidden_size, True, **kw)

    def __call__(self, params, hidden, attn_args, alibi_bias,
                 cache: Optional[StaticKVCache], cache_position):
        b, s, e = hidden.shape
        fused = self.query_key_value(params["query_key_value"], hidden)
        qkv = fused.reshape(b, s, self.num_heads, 3, self.head_dim)
        q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]
        if cache is not None:
            cache = cache.update(self.layer_idx, k, v, cache_position)
            k, v = cache.layer(self.layer_idx)
            k = k.astype(self.dtype)
            v = v.astype(self.dtype)
        kwargs = dict(attn_args)
        # alibi is added to the scaled scores unscaled (reference :270
        # baddbmm beta=1), i.e. it rides the additive mask bias.
        mask = causal_mask_bool(kwargs.pop("q_positions"), kwargs.pop("kv_valid"))
        kwargs["bias"] = to_additive(mask, jnp.float32) + alibi_bias
        kwargs.pop("is_causal", None)
        attn_fn = get_attention_fn(self.config.attn_implementation)
        out = attn_fn(q, k, v, scale=self.scale, **kwargs)
        return self.dense(params["dense"], out.reshape(b, s, e)), cache


class BloomMLP(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.dense_h_to_4h = Linear(config.hidden_size, 4 * config.hidden_size, True, **kw)
        self.dense_4h_to_h = Linear(4 * config.hidden_size, config.hidden_size, True, **kw)

    def __call__(self, params, x):
        # bloom_gelu_forward (reference :115) == the GPT-2 tanh approximation
        return self.dense_4h_to_h(params["dense_4h_to_h"],
                                  gelu_new(self.dense_h_to_4h(params["dense_h_to_4h"], x)))


class BloomBlock(Module):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.input_layernorm = LayerNorm(config.hidden_size, config.layer_norm_epsilon, **kw)
        self.self_attention = BloomAttention(config, layer_idx, **kw)
        self.post_attention_layernorm = LayerNorm(config.hidden_size, config.layer_norm_epsilon, **kw)
        self.mlp = BloomMLP(config, **kw)
        self.post_ln_residual = config.apply_residual_connection_post_layernorm

    def __call__(self, params, hidden, attn_args, alibi_bias, cache, cache_position):
        ln_out = self.input_layernorm(params["input_layernorm"], hidden)
        residual = ln_out if self.post_ln_residual else hidden
        attn_out, cache = self.self_attention(params["self_attention"], ln_out,
                                              attn_args, alibi_bias, cache, cache_position)
        attn_out = attn_out + residual
        ln_out = self.post_attention_layernorm(params["post_attention_layernorm"], attn_out)
        residual = ln_out if self.post_ln_residual else attn_out
        return self.mlp(params["mlp"], ln_out) + residual, cache


class BloomModel(Module):
    def __init__(self, config: BloomConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.word_embeddings = Embedding(config.vocab_size, config.hidden_size,
                                         embedding_init=normal_init(config.initializer_range), **kw)
        self.word_embeddings_layernorm = LayerNorm(config.hidden_size, config.layer_norm_epsilon, **kw)
        self.h = [BloomBlock(config, i, **kw) for i in range(config.n_layer)]
        self.ln_f = LayerNorm(config.hidden_size, config.layer_norm_epsilon, **kw)

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
        hidden = self.word_embeddings_layernorm(params["word_embeddings_layernorm"], inputs_embeds)
        b, s, _ = hidden.shape

        kv_len = past_key_values.max_len if past_key_values is not None else s
        q_positions = jnp.asarray(cache_position, jnp.int32) + jnp.arange(s, dtype=jnp.int32)[None, :]
        q_positions = jnp.broadcast_to(q_positions, (b, s))
        kv_valid = attention_mask if attention_mask is not None else jnp.ones((b, kv_len), jnp.int32)
        attn_args = {"q_positions": q_positions, "kv_valid": kv_valid, "is_causal": True}
        alibi_bias = build_alibi_bias(kv_valid, self.config.n_head)

        all_hidden = [] if output_hidden_states else None
        cache = past_key_values
        for i, block in enumerate(self.h):
            if output_hidden_states:
                all_hidden.append(hidden)
            hidden, cache = block(params["h"][str(i)], hidden, attn_args, alibi_bias,
                                  cache, cache_position)
        hidden = self.ln_f(params["ln_f"], hidden)
        if output_hidden_states:
            all_hidden.append(hidden)
        return BaseModelOutputWithPast(
            last_hidden_state=hidden, past_key_values=cache,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None,
        )


class BloomPreTrainedModel(PreTrainedModel):
    config_class = BloomConfig
    base_model_prefix = "transformer"


class BloomForCausalLM(BloomPreTrainedModel, GenerationMixin):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.transformer = BloomModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def get_input_embedding_path(self):
        return "transformer.word_embeddings.weight"

    def compute_logits(self, params, hidden):
        return self.transformer.word_embeddings.attend(
            params["transformer"]["word_embeddings"], hidden)

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


class BloomModelStandalone(BloomPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.transformer = BloomModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.transformer(params["transformer"], *args, **kwargs)
