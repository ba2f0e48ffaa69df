"""Informer, TPU-native (reference src/transformers/models/informer/modeling_informer.py).

TimeSeriesTransformer skeleton + two Informer specifics:
- **ProbSparse attention** (`attention_type="prob"`): score a static-size
  random key sample, keep the top-u "active" queries (u is computed from
  static sequence lengths, so the top-k/gather/scatter all have static
  shapes — XLA-friendly sparsity), and fill "lazy" query rows with the
  mean (encoder) or causal cumsum (decoder) of the values.
- **Distilling** (`distil=True`): circular-padded conv + batchnorm + ELU +
  stride-2 maxpool between encoder layers, halving time per layer.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ...core.module import BatchNorm, Conv, Module
from ...ops.masks import causal_mask_bool, to_additive
from ..bart.modeling_bart import (BartAttention, BartDecoderLayer,
                                  BartEncoderLayer)
from ..time_series_transformer.modeling_time_series_transformer import (
    TimeSeriesTransformerForPrediction, TimeSeriesTransformerModel,
    TimeSeriesTransformerPreTrainedModel, _TSDecoder, _TSEncoder)
from .configuration_informer import InformerConfig


class InformerProbSparseAttention(BartAttention):
    """(reference InformerProbSparseAttention).  Deterministic given the
    fixed fold-in key for the key-sample draw (the reference uses
    torch.randint, fresh each call)."""

    def __init__(self, embed_dim, num_heads, config, sampling_factor, is_decoder,
                 *, dtype, param_dtype):
        super().__init__(embed_dim, num_heads, config, dtype=dtype,
                         param_dtype=param_dtype)
        self.factor = sampling_factor
        self.is_decoder_attn = is_decoder

    def __call__(self, params, hidden, attn_args, kv_precomputed=None,
                 cache=None, layer_idx: int = 0, cache_position=0):
        b, s, e = hidden.shape
        q = self.q_proj(params["q_proj"], hidden) * self.scale
        q = q.reshape(b, s, self.num_heads, self.head_dim)
        k, v = self.kv(params, hidden)
        bh = b * self.num_heads
        q = q.transpose(0, 2, 1, 3).reshape(bh, s, self.head_dim)
        k = k.transpose(0, 2, 1, 3).reshape(bh, s, self.head_dim)
        v = v.transpose(0, 2, 1, 3).reshape(bh, s, self.head_dim)

        log_lk = math.ceil(math.log1p(s))
        log_lq = math.ceil(math.log1p(s))
        u_part = min(self.factor * s * log_lk, s)
        u = min(self.factor * log_lq, s)

        idx_sample = jax.random.randint(jax.random.key(0), (u_part,), 0, s)
        k_sample = k[:, idx_sample]
        qk_sample = jnp.einsum("bqd,bkd->bqk", q, k_sample)
        sparsity = qk_sample.max(-1) - qk_sample.sum(-1) / s
        _, top_u = jax.lax.top_k(sparsity, u)                 # [bh, u]
        rows = jnp.arange(bh)[:, None]
        q_reduce = q[rows, top_u]                             # [bh, u, d]
        scores = jnp.einsum("bqd,bkd->bqk", q_reduce, k).astype(jnp.float32)

        # additive mask rows for the selected queries
        mask_bias = None
        if attn_args.get("is_causal"):
            q_pos = attn_args["q_positions"]                  # [b, s]
            kv_valid = attn_args["kv_valid"]
            full = to_additive(causal_mask_bool(q_pos, kv_valid), jnp.float32)
        elif attn_args.get("kv_valid") is not None:
            kv_valid = attn_args["kv_valid"]
            full = to_additive(kv_valid.astype(bool)[:, None, None, :], jnp.float32)
            full = jnp.broadcast_to(full, (b, 1, s, s))
        else:
            full = None
        if full is not None:
            full = jnp.broadcast_to(full, (b, self.num_heads, s, s)).reshape(bh, s, s)
            mask_bias = full[rows, top_u]                     # [bh, u, s]
            scores = scores + mask_bias
        probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        attn_out = jnp.einsum("bqk,bkd->bqd", probs, v)       # [bh, u, d]

        if self.is_decoder_attn:
            context = jnp.cumsum(v.astype(jnp.float32), axis=-2).astype(v.dtype)
        else:
            context = jnp.broadcast_to(v.mean(-2, keepdims=True), v.shape)
        out = context.at[rows, top_u].set(attn_out)
        out = out.reshape(b, self.num_heads, s, self.head_dim).transpose(0, 2, 1, 3)
        return self.out_proj(params["out_proj"], out.reshape(b, s, e)), cache


class InformerConvLayer(Module):
    """Distil layer: circular conv3 + batchnorm + ELU + maxpool3/2
    (reference InformerConvLayer)."""

    def __init__(self, c_in, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.downConv = Conv(c_in, c_in, 3, padding=0, ndim=1, dtype=dtype,
                             param_dtype=param_dtype)
        self.norm = BatchNorm(c_in, 1e-5, dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, x):  # [b, t, c]
        h = jnp.swapaxes(x, 1, 2)
        h = jnp.pad(h, ((0, 0), (0, 0), (1, 1)), mode="wrap")
        h = self.downConv(params["downConv"], h)
        h = self.norm(params["norm"], h)
        h = jax.nn.elu(h)
        h = jax.lax.reduce_window(
            h, -jnp.inf, jax.lax.max, (1, 1, 3), (1, 1, 2), [(0, 0), (0, 0), (1, 1)])
        return jnp.swapaxes(h, 1, 2)


def _swap_prob_attention(layer, config, heads, is_decoder, kw):
    if config.attention_type == "prob":
        layer.self_attn = InformerProbSparseAttention(
            config.d_model, heads, config, config.sampling_factor, is_decoder, **kw)


class InformerEncoder(_TSEncoder):
    def __init__(self, config: InformerConfig, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        for layer in self.layers:
            _swap_prob_attention(layer, config, config.encoder_attention_heads,
                                 False, kw)
        if config.distil:
            self.conv_layers = [InformerConvLayer(config.d_model, **kw)
                                for _ in range(config.encoder_layers - 1)]
        else:
            self.conv_layers = []

    def __call__(self, params, inputs_embeds, attention_mask=None):
        b, s, _ = inputs_embeds.shape
        h = self.value_embedding(params["value_embedding"], inputs_embeds)
        pos = self.embed_positions(params["embed_positions"],
                                   jnp.arange(s, dtype=jnp.int32))
        h = self.layernorm_embedding(params["layernorm_embedding"], h + pos[None])
        # the reference encoder runs unmasked (mask lengths would go stale
        # across distil downsampling); forecasting contexts are always dense
        attn_args = {"is_causal": False}
        for i, layer in enumerate(self.layers):
            h = layer(params["layers"][str(i)], h, attn_args)
            if i < len(self.conv_layers):
                h = self.conv_layers[i](params["conv_layers"][str(i)], h)
        return h


class InformerDecoder(_TSDecoder):
    def __init__(self, config: InformerConfig, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        for layer in self.layers:
            _swap_prob_attention(layer, config, config.decoder_attention_heads,
                                 True, kw)


class InformerModel(TimeSeriesTransformerModel):
    encoder_cls = InformerEncoder
    decoder_cls = InformerDecoder


class InformerPreTrainedModel(TimeSeriesTransformerPreTrainedModel):
    config_class = InformerConfig
    _keys_to_ignore_on_load_unexpected = (r"num_batches_tracked$",)


class InformerModelStandalone(InformerPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.model = InformerModel(config, dtype=self.dtype,
                                   param_dtype=self.param_dtype)

    def __call__(self, params, **kwargs):
        return self.model(params["model"], **kwargs)


class InformerForPrediction(TimeSeriesTransformerForPrediction):
    config_class = InformerConfig
    model_cls = InformerModel
    _keys_to_ignore_on_load_unexpected = (r"num_batches_tracked$",)
