"""T5, TPU-native (reference src/transformers/models/t5/modeling_t5.py).

Encoder-decoder with bucketed relative position bias (shared from block 0),
unscaled attention (scale=1.0), RMS layer norm, and relu/gated-gelu FF.
Decode follows the shared seq2seq design: cross K/V precomputed, static
self-attn cache, relative bias recomputed per step from integer positions
(data, not closures).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...cache_utils import StaticKVCache, init_static_cache
from ...core.module import Embedding, Linear, Module, RMSNorm, normal_init
from ...generation.seq2seq import EncoderDecoderGenerationMixin
from ...modeling_outputs import BaseModelOutput, Seq2SeqLMOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...ops.attention import eager_attention
from ...ops.masks import causal_mask_bool, to_additive
from .configuration_t5 import T5Config


def relative_position_bucket(relative_position, *, bidirectional: bool,
                             num_buckets: int, max_distance: int):
    """reference modeling_t5.py T5Attention._relative_position_bucket."""
    rp = relative_position
    ret = jnp.zeros_like(rp)
    if bidirectional:
        num_buckets //= 2
        ret = ret + (rp > 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(rp)
    else:
        n = -jnp.minimum(rp, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-9) / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_large = jnp.minimum(val_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_large)


class T5Attention(Module):
    """Unscaled attention, optional relative bias (reference T5Attention)."""

    def __init__(self, config: T5Config, has_relative_attention_bias=False,
                 *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.num_heads = config.num_heads
        self.d_kv = config.d_kv
        inner = config.num_heads * config.d_kv
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.05))
        self.q = Linear(config.d_model, inner, False, **kw)
        self.k = Linear(config.d_model, inner, False, **kw)
        self.v = Linear(config.d_model, inner, False, **kw)
        self.o = Linear(inner, config.d_model, False, **kw)
        self.has_relative_attention_bias = has_relative_attention_bias
        if has_relative_attention_bias:
            self.relative_attention_bias = Embedding(
                config.relative_attention_num_buckets, config.num_heads, **{
                    "dtype": dtype, "param_dtype": param_dtype,
                    "embedding_init": normal_init(0.05)})

    def compute_bias(self, params, q_positions, kv_positions, *, bidirectional):
        """[1, H, Q, K] additive bias from integer positions."""
        rel = kv_positions[None, :] - q_positions[:, None]  # [Q, K] (memory - query)
        bucket = relative_position_bucket(
            rel, bidirectional=bidirectional,
            num_buckets=self.config.relative_attention_num_buckets,
            max_distance=self.config.relative_attention_max_distance)
        table = params["relative_attention_bias"]["weight"].astype(jnp.float32)
        bias = jnp.take(table, bucket, axis=0)  # [Q, K, H]
        return bias.transpose(2, 0, 1)[None]     # [1, H, Q, K]

    def kv(self, params, hidden):
        b, s, _ = hidden.shape
        k = self.k(params["k"], hidden).reshape(b, s, self.num_heads, self.d_kv)
        v = self.v(params["v"], hidden).reshape(b, s, self.num_heads, self.d_kv)
        return k, v

    def __call__(self, params, hidden, bias, kv_hidden=None, kv_precomputed=None,
                 cache: Optional[StaticKVCache] = None, layer_idx: int = 0, cache_position=0):
        b, s, _ = hidden.shape
        q = self.q(params["q"], hidden).reshape(b, s, self.num_heads, self.d_kv)
        if kv_precomputed is not None:
            k, v = kv_precomputed
        else:
            k, v = self.kv(params, kv_hidden if kv_hidden is not None else hidden)
            if cache is not None:
                cache = cache.update(layer_idx, k, v, cache_position)
                k, v = cache.layer(layer_idx)
                k = k.astype(self.dtype)
                v = v.astype(self.dtype)
        out = eager_attention(q, k, v, bias, scale=1.0)
        out = out.reshape(b, s, self.num_heads * self.d_kv)
        return self.o(params["o"], out), cache


class T5DenseActDense(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.05))
        self.wi = Linear(config.d_model, config.d_ff, False, **kw)
        self.wo = Linear(config.d_ff, config.d_model, False, **kw)
        self.act = get_activation(config.dense_act_fn)

    def __call__(self, params, x):
        return self.wo(params["wo"], self.act(self.wi(params["wi"], x)))


class T5DenseGatedActDense(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.05))
        self.wi_0 = Linear(config.d_model, config.d_ff, False, **kw)
        self.wi_1 = Linear(config.d_model, config.d_ff, False, **kw)
        self.wo = Linear(config.d_ff, config.d_model, False, **kw)
        self.act = get_activation(config.dense_act_fn)

    def __call__(self, params, x):
        return self.wo(params["wo"],
                       self.act(self.wi_0(params["wi_0"], x)) * self.wi_1(params["wi_1"], x))


class T5LayerSelfAttention(Module):
    def __init__(self, config, has_bias, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.SelfAttention = T5Attention(config, has_bias, dtype=dtype, param_dtype=param_dtype)
        self.layer_norm = RMSNorm(config.d_model, config.layer_norm_epsilon,
                                  dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, hidden, bias, cache=None, layer_idx=0, cache_position=0):
        h = self.layer_norm(params["layer_norm"], hidden)
        h, cache = self.SelfAttention(params["SelfAttention"], h, bias,
                                      cache=cache, layer_idx=layer_idx,
                                      cache_position=cache_position)
        return hidden + h, cache


class T5LayerCrossAttention(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.EncDecAttention = T5Attention(config, False, dtype=dtype, param_dtype=param_dtype)
        self.layer_norm = RMSNorm(config.d_model, config.layer_norm_epsilon,
                                  dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, hidden, bias, kv_precomputed):
        h = self.layer_norm(params["layer_norm"], hidden)
        h, _ = self.EncDecAttention(params["EncDecAttention"], h, bias,
                                    kv_precomputed=kv_precomputed)
        return hidden + h


class T5LayerFF(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        if config.is_gated_act:
            self.DenseReluDense = T5DenseGatedActDense(config, dtype=dtype, param_dtype=param_dtype)
        else:
            self.DenseReluDense = T5DenseActDense(config, dtype=dtype, param_dtype=param_dtype)
        self.layer_norm = RMSNorm(config.d_model, config.layer_norm_epsilon,
                                  dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, hidden):
        h = self.DenseReluDense(params["DenseReluDense"],
                                self.layer_norm(params["layer_norm"], hidden))
        return hidden + h


class T5Block(Module):
    def __init__(self, config, has_bias, is_decoder, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        sublayers = [T5LayerSelfAttention(config, has_bias, **kw)]
        if is_decoder:
            sublayers.append(T5LayerCrossAttention(config, **kw))
        sublayers.append(T5LayerFF(config, **kw))
        self.layer = sublayers
        self.is_decoder = is_decoder

    def __call__(self, params, hidden, self_bias, cross_bias=None, cross_kv=None,
                 cache=None, layer_idx=0, cache_position=0):
        hidden, cache = self.layer[0](params["layer"]["0"], hidden, self_bias,
                                      cache, layer_idx, cache_position)
        if self.is_decoder:
            hidden = self.layer[1](params["layer"]["1"], hidden, cross_bias, cross_kv)
            hidden = self.layer[2](params["layer"]["2"], hidden)
        else:
            hidden = self.layer[1](params["layer"]["1"], hidden)
        return hidden, cache


class T5Stack(Module):
    # UMT5: every layer owns its relative_attention_bias, computed per layer
    per_layer_bias = False

    def __init__(self, config: T5Config, is_decoder: bool, num_layers: int, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.is_decoder = is_decoder
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.block = [self.make_block(config, i, num_layers, kw) for i in range(num_layers)]
        self.final_layer_norm = RMSNorm(config.d_model, config.layer_norm_epsilon, **kw)

    def make_block(self, config, i, num_layers, kw):
        has_bias = True if self.per_layer_bias else (i == 0)
        return T5Block(config, has_bias=has_bias, is_decoder=self.is_decoder, **kw)

    def bias_params(self, params):
        return params["block"]["0"]["layer"]["0"]["SelfAttention"]

    def __call__(self, params, inputs_embeds, *, attention_mask=None, cross_kv=None,
                 encoder_mask=None, cache=None, cache_position=0):
        b, s, _ = inputs_embeds.shape
        hidden = inputs_embeds
        kv_len = cache.max_len if cache is not None else s
        q_positions = jnp.asarray(cache_position, jnp.int32) + jnp.arange(s, dtype=jnp.int32)
        kv_positions = jnp.arange(kv_len, dtype=jnp.int32)

        kv_valid = attention_mask if attention_mask is not None else jnp.ones((b, kv_len), jnp.int32)
        if self.is_decoder:
            mask = causal_mask_bool(jnp.broadcast_to(q_positions[None, :], (b, s)), kv_valid)
        else:
            mask = kv_valid.astype(bool)[:, None, None, :]
        mask_bias = to_additive(mask, jnp.float32)
        if not self.per_layer_bias:
            attn0 = self.block[0].layer[0].SelfAttention
            self_bias = attn0.compute_bias(self.bias_params(params), q_positions, kv_positions,
                                           bidirectional=not self.is_decoder) + mask_bias

        cross_bias = None
        if self.is_decoder and cross_kv is not None:
            enc_len = cross_kv[0][0].shape[1]
            if encoder_mask is not None:
                cross_bias = to_additive(encoder_mask.astype(bool)[:, None, None, :], jnp.float32)
            else:
                cross_bias = jnp.zeros((b, 1, 1, enc_len), jnp.float32)

        for i, block in enumerate(self.block):
            if self.per_layer_bias:
                attn = block.layer[0].SelfAttention
                self_bias = attn.compute_bias(
                    params["block"][str(i)]["layer"]["0"]["SelfAttention"],
                    q_positions, kv_positions,
                    bidirectional=not self.is_decoder) + mask_bias
            hidden, cache = block(params["block"][str(i)], hidden, self_bias, cross_bias,
                                  cross_kv[i] if cross_kv is not None else None,
                                  cache, i, cache_position)
        hidden = self.final_layer_norm(params["final_layer_norm"], hidden)
        return hidden, cache


class T5PreTrainedModel(PreTrainedModel):
    config_class = T5Config
    base_model_prefix = ""
    _keys_to_ignore_on_load_unexpected = (
        r"(encoder|decoder)\.embed_tokens\.weight$", r"^lm_head\.weight$")


class T5ForConditionalGeneration(T5PreTrainedModel, EncoderDecoderGenerationMixin):
    """reference modeling_t5.py T5ForConditionalGeneration (shared embedding,
    scaled tied lm_head)."""

    stack_cls = T5Stack

    def __init__(self, config: T5Config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.shared = Embedding(config.vocab_size, config.d_model,
                                embedding_init=normal_init(1.0), **kw)
        self.encoder = self.stack_cls(config, False, config.num_layers, **kw)
        self.decoder = self.stack_cls(config, True, config.num_decoder_layers, **kw)
        if not config.tie_word_embeddings:
            self.lm_head = Linear(config.d_model, config.vocab_size, False, **kw)

    def get_input_embedding_path(self):
        return "shared.weight"

    @property
    def _keys_to_ignore_on_load_unexpected(self):
        # lm_head is real when untied
        if self.config.tie_word_embeddings:
            return (r"(encoder|decoder)\.embed_tokens\.weight$", r"^lm_head\.weight$")
        return (r"(encoder|decoder)\.embed_tokens\.weight$",)

    # -------------------------------------------------------- seq2seq hooks
    def encode(self, params, input_ids, attention_mask=None) -> BaseModelOutput:
        embeds = self.shared(params["shared"], input_ids)
        hidden, _ = self.encoder(params["encoder"], embeds, attention_mask=attention_mask)
        return BaseModelOutput(last_hidden_state=hidden)

    def precompute_cross_kv(self, params, encoder_hidden):
        out = []
        for i, block in enumerate(self.decoder.block):
            attn = block.layer[1].EncDecAttention
            out.append(attn.kv(params["decoder"]["block"][str(i)]["layer"]["1"]["EncDecAttention"],
                               encoder_hidden))
        return tuple(out)

    def decode_step(self, params, input_ids, cross_kv, cache, cache_position,
                    decoder_mask, encoder_mask):
        embeds = self.shared(params["shared"], input_ids)
        hidden, new_cache = self.decoder(
            params["decoder"], embeds, attention_mask=decoder_mask, cross_kv=cross_kv,
            encoder_mask=encoder_mask, cache=cache, cache_position=cache_position)
        return hidden, new_cache

    def compute_logits(self, params, hidden):
        if self.config.tie_word_embeddings:
            # reference scales tied-logit inputs by d_model**-0.5
            hidden = hidden * (self.config.d_model**-0.5)
            return self.shared.attend(params["shared"], hidden)
        return self.lm_head(params["lm_head"], hidden)

    def init_decoder_cache(self, batch_size: int, max_len: int, dtype=None) -> StaticKVCache:
        c = self.config
        return init_static_cache(num_layers=c.num_decoder_layers, batch_size=batch_size,
                                 max_len=max_len, num_kv_heads=c.num_heads, head_dim=c.d_kv,
                                 dtype=dtype or self.dtype)

    # ---------------------------------------------------------- full forward
    def __call__(self, params, input_ids=None, attention_mask=None, decoder_input_ids=None,
                 decoder_attention_mask=None, encoder_outputs=None, past_key_values=None,
                 cache_position=0, labels=None, **kwargs) -> Seq2SeqLMOutput:
        if encoder_outputs is None:
            encoder_outputs = self.encode(params, input_ids, attention_mask)
        if decoder_input_ids is None and labels is not None:
            start = self.config.decoder_start_token_id
            decoder_input_ids = jnp.concatenate(
                [jnp.full((labels.shape[0], 1), start, labels.dtype), labels[:, :-1]], axis=1)
            decoder_input_ids = jnp.where(decoder_input_ids == -100, self.config.pad_token_id,
                                          decoder_input_ids)
        cross_kv = self.precompute_cross_kv(params, encoder_outputs.last_hidden_state)
        hidden, cache = self.decode_step(params, decoder_input_ids, cross_kv, past_key_values,
                                         cache_position, decoder_attention_mask, attention_mask)
        logits = self.compute_logits(params, hidden)
        loss = None
        if labels is not None:
            from ...loss import for_masked_lm_loss

            loss = for_masked_lm_loss(logits, labels, self.config.vocab_size)
        return Seq2SeqLMOutput(loss=loss, logits=logits, past_key_values=cache,
                               encoder_last_hidden_state=encoder_outputs.last_hidden_state)


class T5EncoderModel(T5PreTrainedModel):
    def __init__(self, config: T5Config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.shared = Embedding(config.vocab_size, config.d_model,
                                embedding_init=normal_init(1.0), **kw)
        self.encoder = T5Stack(config, False, config.num_layers, **kw)

    def __call__(self, params, input_ids=None, attention_mask=None, **kwargs) -> BaseModelOutput:
        embeds = self.shared(params["shared"], input_ids)
        hidden, _ = self.encoder(params["encoder"], embeds, attention_mask=attention_mask)
        return BaseModelOutput(last_hidden_state=hidden)
