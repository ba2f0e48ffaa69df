"""Pix2Struct, TPU-native (reference src/transformers/models/pix2struct/modeling_pix2struct.py).

Screenshot→text: a ViT-style encoder over pre-flattened image patches
(first two lanes of each patch vector carry row/col indices for learned 2D
positions; RMS norms, unscaled T5-flavored attention, gated-gelu MLP) and a
T5-flavored text decoder (layer-0 relative bias, untied lm_head by default).
Decode rides the shared seq2seq loop: cross K/V precomputed, static cache.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...cache_utils import StaticKVCache, init_static_cache
from ...core.module import Embedding, Linear, Module, RMSNorm, normal_init
from ...generation.seq2seq import EncoderDecoderGenerationMixin
from ...modeling_outputs import BaseModelOutput, Seq2SeqLMOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...ops.attention import eager_attention
from ...ops.masks import causal_mask_bool, to_additive
from ..t5.modeling_t5 import relative_position_bucket
from .configuration_pix2struct import (Pix2StructConfig, Pix2StructTextConfig,
                                       Pix2StructVisionConfig)


class Pix2StructVisionEmbeddings(Module):
    """Patch projection + learned row/col embeddings read from the first two
    lanes of each flattened patch (reference Pix2StructVisionEmbeddings)."""

    def __init__(self, config: Pix2StructVisionConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.patch_projection = Linear(config.patch_embed_hidden_size,
                                       config.hidden_size, True,
                                       kernel_init=normal_init(0.02), **kw)
        self.row_embedder = Embedding(config.seq_len, config.hidden_size,
                                      embedding_init=normal_init(0.02), **kw)
        self.column_embedder = Embedding(config.seq_len, config.hidden_size,
                                         embedding_init=normal_init(0.02), **kw)

    def __call__(self, params, flattened_patches):
        rows = flattened_patches[:, :, 0].astype(jnp.int32)
        cols = flattened_patches[:, :, 1].astype(jnp.int32)
        patches = flattened_patches[:, :, 2:]
        return (self.patch_projection(params["patch_projection"], patches)
                + self.row_embedder(params["row_embedder"], rows)
                + self.column_embedder(params["column_embedder"], cols))


class Pix2StructVisionAttention(Module):
    """Unscaled MHA, projections named query/key/value/output
    (reference Pix2StructVisionAttention)."""

    def __init__(self, hidden_size, d_kv, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.d_kv = d_kv
        self.num_heads = hidden_size // d_kv
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.02))
        self.query = Linear(hidden_size, hidden_size, False, **kw)
        self.key = Linear(hidden_size, hidden_size, False, **kw)
        self.value = Linear(hidden_size, hidden_size, False, **kw)
        self.output = Linear(hidden_size, hidden_size, False, **kw)

    def __call__(self, params, hidden, bias):
        b, s, e = hidden.shape
        q = self.query(params["query"], hidden).reshape(b, s, self.num_heads, self.d_kv)
        k = self.key(params["key"], hidden).reshape(b, s, self.num_heads, self.d_kv)
        v = self.value(params["value"], hidden).reshape(b, s, self.num_heads, self.d_kv)
        out = eager_attention(q, k, v, bias, scale=1.0).reshape(b, s, e)
        return self.output(params["output"], out)


class Pix2StructVisionMlp(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.02))
        self.wi_0 = Linear(config.hidden_size, config.d_ff, False, **kw)
        self.wi_1 = Linear(config.hidden_size, config.d_ff, False, **kw)
        self.wo = Linear(config.d_ff, config.hidden_size, False, **kw)
        self.act = get_activation(config.dense_act_fn)

    def __call__(self, params, x):
        return self.wo(params["wo"],
                       self.act(self.wi_0(params["wi_0"], x)) * self.wi_1(params["wi_1"], x))


class Pix2StructVisionLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.attention = Pix2StructVisionAttention(config.hidden_size, config.d_kv, **kw)
        self.mlp = Pix2StructVisionMlp(config, **kw)
        self.pre_mlp_layer_norm = RMSNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.pre_attention_layer_norm = RMSNorm(config.hidden_size,
                                                config.layer_norm_eps, **kw)

    def __call__(self, params, hidden, bias):
        h = self.pre_attention_layer_norm(params["pre_attention_layer_norm"], hidden)
        hidden = hidden + self.attention(params["attention"], h, bias)
        h = self.pre_mlp_layer_norm(params["pre_mlp_layer_norm"], hidden)
        return hidden + self.mlp(params["mlp"], h)


class Pix2StructVisionModel(Module):
    def __init__(self, config: Pix2StructVisionConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embeddings = Pix2StructVisionEmbeddings(config, **kw)
        self.encoder = _VisionEncoder(config, **kw)
        self.layernorm = RMSNorm(config.hidden_size, config.layer_norm_eps, **kw)

    def __call__(self, params, flattened_patches, attention_mask=None):
        if attention_mask is None:
            attention_mask = (flattened_patches.sum(-1) != 0).astype(jnp.int32)
        hidden = self.embeddings(params["embeddings"],
                                 jnp.asarray(flattened_patches, self.dtype))
        bias = to_additive(attention_mask.astype(bool)[:, None, None, :], jnp.float32)
        for i, layer in enumerate(self.encoder.layer):
            hidden = layer(params["encoder"]["layer"][str(i)], hidden, bias)
        return self.layernorm(params["layernorm"], hidden)


class _VisionEncoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.layer = [Pix2StructVisionLayer(config, dtype=dtype, param_dtype=param_dtype)
                      for _ in range(config.num_hidden_layers)]


# ------------------------------------------------------------------ text side
class Pix2StructTextAttention(Module):
    """T5-style unscaled attention, projections named query/key/value/output
    (reference Pix2StructTextAttention)."""

    def __init__(self, config: Pix2StructTextConfig, has_bias, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.d_kv = config.d_kv
        self.num_heads = config.hidden_size // config.d_kv
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.02))
        h = config.hidden_size
        self.query = Linear(h, h, False, **kw)
        self.key = Linear(h, h, False, **kw)
        self.value = Linear(h, h, False, **kw)
        self.output = Linear(h, h, False, **kw)
        self.has_relative_attention_bias = has_bias
        if has_bias:
            self.relative_attention_bias = Embedding(
                config.relative_attention_num_buckets, self.num_heads,
                dtype=dtype, param_dtype=param_dtype,
                embedding_init=normal_init(0.02))

    def compute_bias(self, params, q_positions, kv_positions):
        rel = kv_positions[None, :] - q_positions[:, None]
        bucket = relative_position_bucket(
            rel, bidirectional=False,
            num_buckets=self.config.relative_attention_num_buckets,
            max_distance=self.config.relative_attention_max_distance)
        table = params["relative_attention_bias"]["weight"].astype(jnp.float32)
        return jnp.take(table, bucket, axis=0).transpose(2, 0, 1)[None]

    def kv(self, params, hidden):
        b, s, _ = hidden.shape
        k = self.key(params["key"], hidden).reshape(b, s, self.num_heads, self.d_kv)
        v = self.value(params["value"], hidden).reshape(b, s, self.num_heads, self.d_kv)
        return k, v

    def __call__(self, params, hidden, bias, kv_precomputed=None,
                 cache: Optional[StaticKVCache] = None, layer_idx=0, cache_position=0):
        b, s, _ = hidden.shape
        q = self.query(params["query"], hidden).reshape(b, s, self.num_heads, self.d_kv)
        if kv_precomputed is not None:
            k, v = kv_precomputed
        else:
            k, v = self.kv(params, hidden)
            if cache is not None:
                cache = cache.update(layer_idx, k, v, cache_position)
                k, v = cache.layer(layer_idx)
                k = k.astype(self.dtype)
                v = v.astype(self.dtype)
        out = eager_attention(q, k, v, bias, scale=1.0)
        out = out.reshape(b, s, self.num_heads * self.d_kv)
        return self.output(params["output"], out), cache


class _TextAttnWrapper(Module):
    def __init__(self, config, has_bias, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.attention = Pix2StructTextAttention(config, has_bias, dtype=dtype,
                                                 param_dtype=param_dtype)
        self.layer_norm = RMSNorm(config.hidden_size, config.layer_norm_epsilon,
                                  dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, hidden, bias, kv_precomputed=None, cache=None,
                 layer_idx=0, cache_position=0):
        h = self.layer_norm(params["layer_norm"], hidden)
        h, cache = self.attention(params["attention"], h, bias, kv_precomputed,
                                  cache, layer_idx, cache_position)
        return hidden + h, cache


class Pix2StructTextLayerFF(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.02))
        self.DenseReluDense = _GatedFF(config, **kw)
        self.layer_norm = RMSNorm(config.hidden_size, config.layer_norm_epsilon,
                                  dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, hidden):
        h = self.layer_norm(params["layer_norm"], hidden)
        return hidden + self.DenseReluDense(params["DenseReluDense"], h)


class _GatedFF(Module):
    def __init__(self, config, *, dtype, param_dtype, kernel_init):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=kernel_init)
        self.wi_0 = Linear(config.hidden_size, config.d_ff, False, **kw)
        self.wi_1 = Linear(config.hidden_size, config.d_ff, False, **kw)
        self.wo = Linear(config.d_ff, config.hidden_size, False, **kw)
        self.act = get_activation(config.dense_act_fn)

    def __call__(self, params, x):
        return self.wo(params["wo"],
                       self.act(self.wi_0(params["wi_0"], x)) * self.wi_1(params["wi_1"], x))


class Pix2StructTextBlock(Module):
    def __init__(self, config, has_bias, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.self_attention = _TextAttnWrapper(config, has_bias, **kw)
        self.encoder_decoder_attention = _TextAttnWrapper(config, False, **kw)
        self.mlp = Pix2StructTextLayerFF(config, **kw)

    def __call__(self, params, hidden, self_bias, cross_bias, cross_kv, cache,
                 layer_idx, cache_position):
        hidden, cache = self.self_attention(params["self_attention"], hidden,
                                            self_bias, None, cache, layer_idx,
                                            cache_position)
        hidden, _ = self.encoder_decoder_attention(
            params["encoder_decoder_attention"], hidden, cross_bias, cross_kv)
        return self.mlp(params["mlp"], hidden), cache


class Pix2StructTextModel(Module):
    """Decoder with cross-attention + lm_head (reference Pix2StructTextModel)."""

    def __init__(self, config: Pix2StructTextConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embed_tokens = Embedding(config.vocab_size, config.hidden_size,
                                      embedding_init=normal_init(0.02), **kw)
        self.layer = [Pix2StructTextBlock(config, has_bias=(i == 0), **kw)
                      for i in range(config.num_layers)]
        self.final_layer_norm = RMSNorm(config.hidden_size,
                                        config.layer_norm_epsilon, **kw)
        if not config.tie_word_embeddings:
            self.lm_head = Linear(config.hidden_size, config.vocab_size, False,
                                  kernel_init=normal_init(0.02), **kw)

    def __call__(self, params, input_ids, cross_kv, cache=None, cache_position=0,
                 attention_mask=None, encoder_mask=None):
        b, s = input_ids.shape
        hidden = self.embed_tokens(params["embed_tokens"], input_ids)
        kv_len = cache.max_len if cache is not None else s
        q_positions = jnp.asarray(cache_position, jnp.int32) + jnp.arange(s, dtype=jnp.int32)
        kv_positions = jnp.arange(kv_len, dtype=jnp.int32)
        kv_valid = (attention_mask if attention_mask is not None
                    else jnp.ones((b, kv_len), jnp.int32))
        mask = causal_mask_bool(jnp.broadcast_to(q_positions[None, :], (b, s)), kv_valid)
        attn0 = self.layer[0].self_attention.attention
        self_bias = attn0.compute_bias(
            params["layer"]["0"]["self_attention"]["attention"],
            q_positions, kv_positions) + to_additive(mask, jnp.float32)
        enc_len = cross_kv[0][0].shape[1]
        if encoder_mask is not None:
            cross_bias = to_additive(encoder_mask.astype(bool)[:, None, None, :],
                                     jnp.float32)
        else:
            cross_bias = jnp.zeros((b, 1, 1, enc_len), jnp.float32)
        for i, block in enumerate(self.layer):
            hidden, cache = block(params["layer"][str(i)], hidden, self_bias,
                                  cross_bias, cross_kv[i], cache, i, cache_position)
        hidden = self.final_layer_norm(params["final_layer_norm"], hidden)
        return hidden, cache

    def compute_logits(self, params, hidden):
        if self.config.tie_word_embeddings:
            return self.embed_tokens.attend(params["embed_tokens"], hidden)
        return self.lm_head(params["lm_head"], hidden)


class Pix2StructPreTrainedModel(PreTrainedModel):
    config_class = Pix2StructConfig
    base_model_prefix = ""


class Pix2StructForConditionalGeneration(Pix2StructPreTrainedModel,
                                         EncoderDecoderGenerationMixin):
    """reference Pix2StructForConditionalGeneration."""

    encoder_input_name = "flattened_patches"

    def __init__(self, config: Pix2StructConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.encoder = Pix2StructVisionModel(config.vision_config, **kw)
        self.decoder = Pix2StructTextModel(config.text_config, **kw)

    def get_input_embedding_path(self):
        return "decoder.embed_tokens.weight"

    @property
    def tied_weights_keys(self):
        if self.config.text_config.tie_word_embeddings:
            return ("decoder.lm_head.weight",)
        return ()

    @property
    def _keys_to_ignore_on_load_unexpected(self):
        if self.config.text_config.tie_word_embeddings:
            return (r"decoder\.lm_head\.weight$",)
        return ()

    def tie_weights(self, params):
        return params

    # ------------------------------------------------------------- s2s hooks
    def encode(self, params, flattened_patches, attention_mask=None) -> BaseModelOutput:
        hidden = self.encoder(params["encoder"], flattened_patches, attention_mask)
        return BaseModelOutput(last_hidden_state=hidden)

    def precompute_cross_kv(self, params, encoder_hidden):
        out = []
        for i, block in enumerate(self.decoder.layer):
            attn = block.encoder_decoder_attention.attention
            out.append(attn.kv(
                params["decoder"]["layer"][str(i)]["encoder_decoder_attention"]["attention"],
                encoder_hidden))
        return tuple(out)

    def decode_step(self, params, input_ids, cross_kv, cache, cache_position,
                    decoder_mask, encoder_mask):
        return self.decoder(params["decoder"], input_ids, cross_kv, cache,
                            cache_position, decoder_mask, encoder_mask)

    def compute_logits(self, params, hidden):
        return self.decoder.compute_logits(params["decoder"], hidden)

    def init_decoder_cache(self, batch_size, max_len, dtype=None) -> StaticKVCache:
        c = self.config.text_config
        return init_static_cache(num_layers=c.num_layers, batch_size=batch_size,
                                 max_len=max_len,
                                 num_kv_heads=c.hidden_size // c.d_kv,
                                 head_dim=c.d_kv, dtype=dtype or self.dtype)

    # --------------------------------------------------------------- forward
    def __call__(self, params, flattened_patches=None, attention_mask=None,
                 decoder_input_ids=None, decoder_attention_mask=None,
                 encoder_outputs=None, past_key_values=None, cache_position=0,
                 labels=None, **kwargs) -> Seq2SeqLMOutput:
        if attention_mask is None and flattened_patches is not None:
            attention_mask = (flattened_patches.sum(-1) != 0).astype(jnp.int32)
        if encoder_outputs is None:
            encoder_outputs = self.encode(params, flattened_patches, attention_mask)
        if decoder_input_ids is None and labels is not None:
            start = self.config.text_config.decoder_start_token_id
            decoder_input_ids = jnp.concatenate(
                [jnp.full((labels.shape[0], 1), start, labels.dtype), labels[:, :-1]],
                axis=1)
            decoder_input_ids = jnp.where(decoder_input_ids == -100,
                                          self.config.text_config.pad_token_id,
                                          decoder_input_ids)
        cross_kv = self.precompute_cross_kv(params, encoder_outputs.last_hidden_state)
        hidden, cache = self.decode_step(params, decoder_input_ids, cross_kv,
                                         past_key_values, cache_position,
                                         decoder_attention_mask, attention_mask)
        logits = self.compute_logits(params, hidden)
        loss = None
        if labels is not None:
            from ...loss import for_masked_lm_loss

            loss = for_masked_lm_loss(logits, labels,
                                      self.config.text_config.vocab_size)
        return Seq2SeqLMOutput(loss=loss, logits=logits, past_key_values=cache,
                               encoder_last_hidden_state=encoder_outputs.last_hidden_state)
