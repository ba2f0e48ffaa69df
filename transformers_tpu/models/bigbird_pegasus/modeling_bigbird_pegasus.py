"""BigBirdPegasus, TPU-native (reference
src/transformers/models/bigbird_pegasus/modeling_bigbird_pegasus.py).

Pegasus-style pre-norm encoder-decoder for long documents whose encoder
self-attention uses BigBird checkpoint layout (``self_attn.self.{query,key,
value}`` + ``self_attn.output``, biasless by default).  As with our BigBird
encoder family, attention is computed as dense masked attention — the exact
math of the reference's ``original_full`` path; the reference's
``block_sparse`` mode is a *randomized approximation* of this quantity
(seeded random blocks), so dense attention is the faithful-and-TPU-friendly
choice (one MXU matmul instead of 10+ gather/einsum stages).  The decoder is
the MBart pre-norm layer with biasless projections; generation rides the
shared seq2seq loop (tied lm_head + final_logits_bias).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.module import Embedding, LayerNorm, Linear, Module, normal_init
from ...ops.masks import to_additive
from ..bart.modeling_bart import (BartAttention, BartDecoder, BartDecoderLayer,
                                  BartForConditionalGeneration, BartModel)
from ..blenderbot.modeling_blenderbot import NoOffsetPositionalEmbedding
from .configuration_bigbird_pegasus import BigBirdPegasusConfig


class _EncoderSelfAttention(Module):
    """BigBird-layout QKV (reference BigBirdPegasusSelfAttention)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.num_heads = config.encoder_attention_heads
        self.head_dim = config.d_model // config.encoder_attention_heads
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.init_std))
        self.query = Linear(config.d_model, config.d_model, config.use_bias, **kw)
        self.key = Linear(config.d_model, config.d_model, config.use_bias, **kw)
        self.value = Linear(config.d_model, config.d_model, config.use_bias, **kw)

    def __call__(self, params, hidden, kv_valid):
        b, s, e = hidden.shape
        q = self.query(params["query"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        k = self.key(params["key"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        v = self.value(params["value"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / (self.head_dim ** 0.5)
        scores = scores.astype(jnp.float32) + to_additive(
            kv_valid.astype(bool)[:, None, None, :], jnp.float32)
        probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, e)


class _EncoderAttention(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        setattr(self, "self", _EncoderSelfAttention(config, dtype=dtype,
                                                    param_dtype=param_dtype))
        self.output = Linear(config.d_model, config.d_model, config.use_bias,
                             dtype=dtype, param_dtype=param_dtype,
                             kernel_init=normal_init(config.init_std))

    def __call__(self, params, hidden, kv_valid):
        ctx = getattr(self, "self")(params["self"], hidden, kv_valid)
        return self.output(params["output"], ctx)


class BigBirdPegasusEncoderLayer(Module):
    """Pre-norm encoder layer (reference BigBirdPegasusEncoderLayer)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        from ...ops.activations import get_activation

        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.d_model
        self.self_attn = _EncoderAttention(config, **kw)
        self.self_attn_layer_norm = LayerNorm(d, 1e-5, **kw)
        lk = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.init_std))
        self.fc1 = Linear(d, config.encoder_ffn_dim, True, **lk)
        self.fc2 = Linear(config.encoder_ffn_dim, d, True, **lk)
        self.final_layer_norm = LayerNorm(d, 1e-5, **kw)
        self.act = get_activation(config.activation_function)

    def __call__(self, params, hidden, attn_args):
        kv_valid = attn_args["kv_valid"]
        h = self.self_attn_layer_norm(params["self_attn_layer_norm"], hidden)
        hidden = hidden + self.self_attn(params["self_attn"], h, kv_valid)
        h = self.final_layer_norm(params["final_layer_norm"], hidden)
        h = self.fc2(params["fc2"], self.act(self.fc1(params["fc1"], h)))
        return hidden + h


class _BiasConfigurableAttention(BartAttention):
    """BartAttention with use_bias-controlled projections (reference
    BigBirdPegasusDecoderAttention)."""

    def __init__(self, embed_dim, num_heads, config, *, dtype, param_dtype):
        Module.__init__(self, dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.num_heads = num_heads
        self.head_dim = embed_dim // num_heads
        self.scale = self.head_dim**-0.5
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.init_std))
        bias = config.use_bias
        self.q_proj = Linear(embed_dim, embed_dim, bias, **kw)
        self.k_proj = Linear(embed_dim, embed_dim, bias, **kw)
        self.v_proj = Linear(embed_dim, embed_dim, bias, **kw)
        self.out_proj = Linear(embed_dim, embed_dim, bias, **kw)


class BigBirdPegasusDecoderLayer(BartDecoderLayer):
    pre_norm = True

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.d_model
        self.self_attn = _BiasConfigurableAttention(
            d, config.decoder_attention_heads, config, **kw)
        self.encoder_attn = _BiasConfigurableAttention(
            d, config.decoder_attention_heads, config, **kw)


class BigBirdPegasusEncoder(Module):
    """Learned no-offset positions; final layernorm named
    ``layernorm_embedding`` applied AFTER the layers (reference
    BigBirdPegasusEncoder)."""

    def __init__(self, config: BigBirdPegasusConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        import math

        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embed_positions = NoOffsetPositionalEmbedding(
            config.max_position_embeddings, config.d_model, **kw)
        self.layers = [BigBirdPegasusEncoderLayer(config, **kw)
                       for _ in range(config.encoder_layers)]
        self.layernorm_embedding = LayerNorm(config.d_model, 1e-5, **kw)
        self.embed_scale = math.sqrt(config.d_model) if config.scale_embedding else 1.0

    def __call__(self, params, inputs_embeds, attention_mask=None):
        b, s, _ = inputs_embeds.shape
        positions = jnp.arange(s, dtype=jnp.int32)[None, :]
        h = inputs_embeds * self.embed_scale \
            + self.embed_positions(params["embed_positions"], positions)
        kv_valid = (attention_mask if attention_mask is not None
                    else jnp.ones((b, s), jnp.int32))
        attn_args = {"kv_valid": kv_valid, "is_causal": False}
        for i, layer in enumerate(self.layers):
            h = layer(params["layers"][str(i)], h, attn_args)
        return self.layernorm_embedding(params["layernorm_embedding"], h)


class BigBirdPegasusDecoder(BartDecoder):
    layer_cls = BigBirdPegasusDecoderLayer
    pos_cls = NoOffsetPositionalEmbedding
    use_layernorm_embedding = False

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.layernorm_embedding = LayerNorm(config.d_model, 1e-5, dtype=dtype,
                                             param_dtype=param_dtype)

    def __call__(self, params, inputs_embeds, cross_kv, cache=None, cache_position=0,
                 attention_mask=None, encoder_mask=None):
        h, cache = super().__call__(params, inputs_embeds, cross_kv, cache,
                                    cache_position, attention_mask, encoder_mask)
        return self.layernorm_embedding(params["layernorm_embedding"], h), cache


class BigBirdPegasusModel(BartModel):
    encoder_cls = BigBirdPegasusEncoder
    decoder_cls = BigBirdPegasusDecoder


class BigBirdPegasusForConditionalGeneration(BartForConditionalGeneration):
    config_class = BigBirdPegasusConfig
    model_cls = BigBirdPegasusModel
