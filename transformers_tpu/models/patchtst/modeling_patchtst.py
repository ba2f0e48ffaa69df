"""PatchTST time-series forecaster (reference
src/transformers/models/patchtst/modeling_patchtst.py).

Channel-independent patching: each input channel is sliced into overlapping
patches, std/mean-scaled per channel, embedded, and run through a
(batch-norm, pre-norm) transformer over the PATCH axis (channels fold into
the batch — ideal for the MXU: one big batched matmul). The prediction head
flattens patches and projects to the forecast horizon, de-scaled by the
per-channel (loc, scale)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...core.module import Linear, Module, normal_init
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...utils.generic import ModelOutput
from dataclasses import dataclass
from typing import Any

from .configuration_patchtst import PatchTSTConfig


@dataclass
class PatchTSTForPredictionOutput(ModelOutput):
    loss: Any = None
    prediction_outputs: Any = None
    loc: Any = None
    scale: Any = None


def patchify(config, past_values):
    """[B, L, C] -> [B, C, num_patches, patch_length] (reference PatchTSTPatchify)."""
    num_patches = config.num_patches
    start = config.context_length - ((num_patches - 1) * config.patch_stride
                                     + config.patch_length)
    x = past_values[:, start:, :]
    idx = (np.arange(num_patches)[:, None] * config.patch_stride
           + np.arange(config.patch_length)[None, :])
    patches = x[:, idx, :]                   # [B, P, patch_len, C]
    return patches.transpose(0, 3, 1, 2)     # [B, C, P, patch_len]


def scale_values(config, data, observed):
    """Per-channel scaling over time (reference PatchTST{Std,Mean}Scaler)."""
    if config.scaling in ("std", True):
        denom = jnp.maximum(observed.sum(1, keepdims=True), 1.0)
        loc = (data * observed).sum(1, keepdims=True) / denom
        var = (((data - loc) * observed) ** 2).sum(1, keepdims=True) / denom
        scale = jnp.sqrt(var + 1e-5)
        return (data - loc) / scale, loc, scale
    if config.scaling == "mean":
        denom = jnp.clip(observed.sum(1, keepdims=True), 1.0, None)
        ts_sum = (data * observed).abs().sum(1, keepdims=True) if hasattr(data, "abs") else (
            jnp.abs(data * observed).sum(1, keepdims=True))
        scale = ts_sum / denom
        scale = jnp.where(scale == 0, 1.0, scale)
        return data / scale, jnp.zeros_like(scale), scale
    b, _, c = data.shape
    return data, jnp.zeros((b, 1, c)), jnp.ones((b, 1, c))


def sincos_position_enc(num_patches, d_model):
    pe = np.zeros((num_patches, d_model), np.float32)
    position = np.arange(num_patches)[:, None]
    div = np.exp(np.arange(0, d_model, 2) * -(np.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    return pe / (pe.std() + 1e-10)  # reference normalizes sincos init


class _BatchNormSeq(Module):
    """BatchNorm1d over d_model applied to [N, S, D] (eval: running stats)."""

    def __init__(self, d_model, eps, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.d = d_model
        self.eps = eps

    def init(self, rng):
        return {"batchnorm": {
            "weight": jnp.ones((self.d,), self.param_dtype),
            "bias": jnp.zeros((self.d,), self.param_dtype),
            "running_mean": jnp.zeros((self.d,), self.param_dtype),
            "running_var": jnp.ones((self.d,), self.param_dtype),
            "num_batches_tracked": jnp.zeros((), jnp.int32)}}

    def __call__(self, params, x):
        bn = params["batchnorm"]
        mean = bn["running_mean"].astype(jnp.float32)
        var = bn["running_var"].astype(jnp.float32)
        w = bn["weight"].astype(jnp.float32)
        b = bn["bias"].astype(jnp.float32)
        h = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.eps) * w + b
        return h.astype(x.dtype)


class PatchTSTAttention(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.num_heads = config.num_attention_heads
        self.head_dim = config.d_model // config.num_attention_heads
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.init_std))
        d = config.d_model
        self.q_proj = Linear(d, d, config.bias, **kw)
        self.k_proj = Linear(d, d, config.bias, **kw)
        self.v_proj = Linear(d, d, config.bias, **kw)
        self.out_proj = Linear(d, d, config.bias, **kw)

    def __call__(self, params, x):
        n, s, d = x.shape
        q = self.q_proj(params["q_proj"], x).reshape(n, s, self.num_heads, self.head_dim)
        k = self.k_proj(params["k_proj"], x).reshape(n, s, self.num_heads, self.head_dim)
        v = self.v_proj(params["v_proj"], x).reshape(n, s, self.num_heads, self.head_dim)
        scores = jnp.einsum("nihd,njhd->nhij", q.astype(jnp.float32),
                            k.astype(jnp.float32)) * (self.head_dim**-0.5)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("nhij,njhd->nihd", probs, v.astype(jnp.float32))
        return self.out_proj(params["out_proj"], out.reshape(n, s, d).astype(x.dtype))


class PatchTSTEncoderLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        lkw = dict(dtype=dtype, param_dtype=param_dtype,
                   kernel_init=normal_init(config.init_std))
        self.config = config
        self.self_attn = PatchTSTAttention(config, **kw)
        self.norm_sublayer1 = _BatchNormSeq(config.d_model, config.norm_eps, **kw)
        if config.channel_attention:
            self.norm_sublayer2 = _BatchNormSeq(config.d_model, config.norm_eps, **kw)
        self.norm_sublayer3 = _BatchNormSeq(config.d_model, config.norm_eps, **kw)
        self.ff = _PatchTSTFF(config, **kw)
        self.act = get_activation(config.activation_function)

    def _attn_block(self, params, x):
        if self.config.pre_norm:
            return x + self.self_attn(params["self_attn"],
                                      self.norm_sublayer1(params["norm_sublayer1"], x))
        return self.norm_sublayer1(params["norm_sublayer1"],
                                   x + self.self_attn(params["self_attn"], x))

    def __call__(self, params, hidden):  # [B, C, P, D]
        b, c, p, d = hidden.shape
        x = hidden.reshape(b * c, p, d)
        x = self._attn_block(params, x)
        x = x.reshape(b, c, p, d)
        if self.config.channel_attention:
            xc = x.transpose(0, 2, 1, 3).reshape(b * p, c, d)
            if self.config.pre_norm:
                xc = xc + self.self_attn(params["self_attn"],
                                         self.norm_sublayer2(params["norm_sublayer2"], xc))
            else:
                xc = self.norm_sublayer2(params["norm_sublayer2"],
                                         xc + self.self_attn(params["self_attn"], xc))
            x = xc.reshape(b, p, c, d).transpose(0, 2, 1, 3)
        x2 = x.reshape(b * c, p, d)
        ff = lambda t: self.ff(params["ff"], t)
        if self.config.pre_norm:
            x2 = x2 + ff(self.norm_sublayer3(params["norm_sublayer3"], x2))
        else:
            x2 = self.norm_sublayer3(params["norm_sublayer3"], x2 + ff(x2))
        return x2.reshape(b, c, p, d)


class _PatchTSTFF(Module):
    """Sequential(Linear, act, dropout, Linear) — checkpoint indices 0/3."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        lkw = dict(dtype=dtype, param_dtype=param_dtype,
                   kernel_init=normal_init(config.init_std))
        setattr(self, "0", Linear(config.d_model, config.ffn_dim, config.bias, **lkw))
        setattr(self, "3", Linear(config.ffn_dim, config.d_model, config.bias, **lkw))
        self.act = get_activation(config.activation_function)

    def __call__(self, params, x):
        h = self.act(getattr(self, "0")(params["0"], x))
        return getattr(self, "3")(params["3"], h)


class PatchTSTEncoder(Module):
    def __init__(self, config: PatchTSTConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embedder = _PatchEmbedder(config, **kw)
        self.layers = [PatchTSTEncoderLayer(config, **kw)
                       for _ in range(config.num_hidden_layers)]
        self.pos = sincos_position_enc(config.num_patches, config.d_model)

    def init(self, rng):
        params = super().init(rng)
        params["positional_encoder"] = {
            "position_enc": jnp.asarray(self.pos, self.param_dtype)}
        return params

    def __call__(self, params, patches):
        h = self.embedder(params["embedder"], patches)
        h = h + params["positional_encoder"]["position_enc"].astype(h.dtype)
        for i, layer in enumerate(self.layers):
            h = layer(params["layers"][str(i)], h)
        return h


class _PatchEmbedder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        if not config.share_embedding:
            raise NotImplementedError("per-channel embeddings land with a follow-up")
        self.input_embedding = Linear(config.patch_length, config.d_model, True,
                                      dtype=dtype, param_dtype=param_dtype,
                                      kernel_init=normal_init(config.init_std))

    def __call__(self, params, patches):
        return self.input_embedding(params["input_embedding"], patches)


class PatchTSTModel(Module):
    def __init__(self, config: PatchTSTConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.encoder = PatchTSTEncoder(config, dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, past_values, past_observed_mask=None):
        if past_observed_mask is None:
            past_observed_mask = jnp.ones_like(past_values)
        scaled, loc, scale = scale_values(self.config, past_values, past_observed_mask)
        patches = patchify(self.config, scaled)
        hidden = self.encoder(params["encoder"], patches)
        return hidden, loc, scale


class PatchTSTPreTrainedModel(PreTrainedModel):
    config_class = PatchTSTConfig
    base_model_prefix = "model"


class PatchTSTForPrediction(PatchTSTPreTrainedModel):
    def __init__(self, config: PatchTSTConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        if config.distribution_output is not None and config.loss != "mse":
            raise NotImplementedError("distribution heads land with a follow-up; "
                                      "use loss='mse' (point forecasts)")
        self.model = PatchTSTModel(config, dtype=self.dtype, param_dtype=self.param_dtype)
        self.head = _PredictionHead(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, past_values=None, past_observed_mask=None,
                 future_values=None, **kwargs) -> PatchTSTForPredictionOutput:
        hidden, loc, scale = self.model(params["model"], past_values, past_observed_mask)
        y_hat = self.head(params["head"], hidden)   # [B, pred_len, C]
        y_hat = y_hat * scale + loc
        loss = None
        if future_values is not None:
            loss = jnp.mean((y_hat - future_values) ** 2)
        return PatchTSTForPredictionOutput(loss=loss, prediction_outputs=y_hat,
                                           loc=loc, scale=scale)


class _PredictionHead(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        if not config.share_projection:
            raise NotImplementedError("per-channel projections land with a follow-up")
        self.pooling = config.pooling_type
        in_dim = (config.d_model if self.pooling in ("mean", "max")
                  else config.num_patches * config.d_model)
        self.projection = Linear(in_dim, config.prediction_length, True, dtype=dtype,
                                 param_dtype=param_dtype,
                                 kernel_init=normal_init(config.init_std))

    def __call__(self, params, hidden):  # [B, C, P, D]
        b, c, p, d = hidden.shape
        if self.pooling == "mean":
            pooled = hidden.mean(axis=2)
        elif self.pooling == "max":
            pooled = hidden.max(axis=2)
        else:
            pooled = hidden.reshape(b, c, p * d)
        out = self.projection(params["projection"], pooled)  # [B, C, pred_len]
        return out.transpose(0, 2, 1)
