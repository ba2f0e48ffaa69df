"""TimesFM time-series foundation model (reference
models/timesfm/modeling_timesfm.py): patched inputs + padding channel through
a residual FF block, per-series normalization by the first sufficiently
observed patch's stats, causal decoder layers with a learned softplus
per-channel query scale, and an autoregressive horizon decode loop emitting
mean + quantile forecasts."""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core.module import Embedding, LayerNorm, Linear, Module, RMSNorm, normal_init
from ...modeling_outputs import BaseModelOutput, ModelOutput
from ...modeling_utils import PreTrainedModel
from .configuration_timesfm import TimesFmConfig


@dataclass
class TimesFmOutput(ModelOutput):
    last_hidden_state: Optional[jnp.ndarray] = None
    loc: Optional[jnp.ndarray] = None
    scale: Optional[jnp.ndarray] = None


@dataclass
class TimesFmOutputForPrediction(ModelOutput):
    mean_predictions: Optional[jnp.ndarray] = None
    full_predictions: Optional[jnp.ndarray] = None
    loss: Optional[jnp.ndarray] = None


class TimesFmResidualBlock(Module):
    """input -> silu(hidden) -> out, plus a linear residual (reference :69)."""

    def __init__(self, input_dims, hidden_dims, output_dims, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.input_layer = Linear(input_dims, hidden_dims, True, **kw)
        self.output_layer = Linear(hidden_dims, output_dims, True, **kw)
        self.residual_layer = Linear(input_dims, output_dims, True, **kw)

    def __call__(self, params, x):
        h = jax.nn.silu(self.input_layer(params["input_layer"], x))
        return (self.output_layer(params["output_layer"], h)
                + self.residual_layer(params["residual_layer"], x))


class TimesFmAttention(Module):
    """Per-channel learned softplus query scaling (reference :243
    _scale_query: softplus(scaling) * 1.442695 / sqrt(head_dim))."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.hidden_size
        self.num_heads = config.num_attention_heads
        self.head_dim = config.head_dim
        q = self.num_heads * self.head_dim
        self.q_proj = Linear(d, q, True, **kw)
        self.k_proj = Linear(d, q, True, **kw)
        self.v_proj = Linear(d, q, True, **kw)
        self.o_proj = Linear(q, d, True, **kw)

    def init(self, rng):
        params = super().init(rng)
        params["scaling"] = jnp.zeros((self.head_dim,), self.param_dtype)
        return params

    def __call__(self, params, hidden, bias):
        b, s, _ = hidden.shape
        shape = (b, s, self.num_heads, self.head_dim)
        q = self.q_proj(params["q_proj"], hidden).reshape(shape)
        scale = (jax.nn.softplus(params["scaling"].astype(jnp.float32))
                 * (1.442695041 / math.sqrt(self.head_dim)))
        q = q * scale[None, None, None, :].astype(q.dtype)
        k = self.k_proj(params["k_proj"], hidden).reshape(shape)
        v = self.v_proj(params["v_proj"], hidden).reshape(shape)
        # [B, H, S, S] logits with additive bias, scaling already applied
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        logits = logits + bias
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, -1)
        return self.o_proj(params["o_proj"], out)


class TimesFmMLP(Module):
    """LayerNorm -> relu(gate) -> down, gated by padding, residual (ref :84)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.gate_proj = Linear(config.hidden_size, config.intermediate_size, True, **kw)
        self.down_proj = Linear(config.intermediate_size, config.hidden_size, True, **kw)
        self.layer_norm = LayerNorm(config.hidden_size, 1e-6, **kw)

    def __call__(self, params, x, paddings=None):
        h = self.layer_norm(params["layer_norm"], x)
        h = jax.nn.relu(self.gate_proj(params["gate_proj"], h))
        out = self.down_proj(params["down_proj"], h)
        if paddings is not None:
            out = out * (1.0 - paddings[:, :, None])
        return out + x


class TimesFmDecoderLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.self_attn = TimesFmAttention(config, **kw)
        self.mlp = TimesFmMLP(config, **kw)
        self.input_layernorm = RMSNorm(config.hidden_size, config.rms_norm_eps, **kw)

    def __call__(self, params, hidden, bias, paddings):
        residual = hidden
        h = self.input_layernorm(params["input_layernorm"], hidden)
        h = self.self_attn(params["self_attn"], h, bias)
        hidden = residual + h
        return self.mlp(params["mlp"], hidden, paddings)


class TimesFmPreTrainedModel(PreTrainedModel):
    config_class = TimesFmConfig
    base_model_prefix = "decoder"
    main_input_name = "past_values"
    # the sinusoid table is a buffer in the reference; recomputed here
    _keys_to_ignore_on_load_unexpected = (r"position_emb\.inv_timescales",)


class TimesFmModel(TimesFmPreTrainedModel):
    """reference TimesFmModel — standalone patched decoder."""

    def __init__(self, config: TimesFmConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.input_ff_layer = TimesFmResidualBlock(
            2 * config.patch_length, config.intermediate_size, config.hidden_size, **kw)
        self.freq_emb = Embedding(config.freq_size, config.hidden_size,
                                  embedding_init=normal_init(config.initializer_range), **kw)
        self.layers = [TimesFmDecoderLayer(config, **kw)
                       for _ in range(config.num_hidden_layers)]
        num_ts = config.hidden_size // 2
        inc = (math.log(config.max_timescale / config.min_timescale)
               / max(num_ts - 1, 1))
        self._inv_timescales = (config.min_timescale
                                * np.exp(np.arange(num_ts) * -inc))

    def _pos_emb(self, seq_length):
        pos = np.arange(seq_length, dtype=np.float64)
        scaled = pos[:, None] * self._inv_timescales[None, :]
        sig = np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1)
        if self.config.hidden_size % 2:
            sig = np.pad(sig, ((0, 0), (0, 1)))
        return jnp.asarray(sig, jnp.float32)[None]

    @staticmethod
    def _masked_mean_std(inputs, padding):
        pad_sum = jnp.sum(1 - padding, axis=2)
        has3 = (pad_sum >= 3).astype(jnp.int32)
        idx = jnp.argmax(has3, axis=1)
        idx = jnp.where(has3.sum(axis=1) == 0, inputs.shape[1] - 1, idx)
        b = jnp.arange(inputs.shape[0])
        arr = inputs[b, idx]
        mask = 1 - padding[b, idx]
        n = jnp.maximum(jnp.sum(mask, axis=1), 1)
        mean = jnp.sum(arr * mask, axis=1) / n
        var = jnp.sum((arr * mask) ** 2, axis=1) / n - mean ** 2
        return mean, jnp.sqrt(jnp.maximum(var, 0.0))

    def __call__(self, params, past_values=None, past_values_padding=None,
                 freq=None, **kwargs) -> TimesFmOutput:
        cfg = self.config
        b = past_values.shape[0]
        x = past_values.reshape(b, -1, cfg.patch_length)
        pads = past_values_padding.reshape(b, -1, cfg.patch_length).astype(x.dtype)
        x = jnp.where(jnp.abs(pads - 1.0) < cfg.tolerance, 0.0, x)
        pads = jnp.where(jnp.abs(x - cfg.pad_val) < cfg.tolerance, 1.0, pads)
        mu, sigma = self._masked_mean_std(x, pads)
        sigma = jnp.where(sigma < cfg.tolerance, 1.0, sigma)
        x = (x - mu[:, None, None]) / sigma[:, None, None]
        x = jnp.where(jnp.abs(x - cfg.pad_val) < cfg.tolerance, cfg.pad_val, x)
        x = x * (1.0 - pads)
        h = self.input_ff_layer(params["input_ff_layer"],
                                jnp.concatenate([x, pads], axis=-1))
        patch_pad = jnp.min(pads, axis=-1)  # [B, N]
        if cfg.use_positional_embedding:
            pe = jnp.broadcast_to(self._pos_emb(h.shape[1]), h.shape)
            # shift each row's positions past its left padding (reference
            # _timesfm_shift_padded_seq)
            first = jnp.argmax((patch_pad == 0).astype(jnp.int32), axis=1)
            first = jnp.where(jnp.all(patch_pad != 0, axis=1), -1, first)
            n = h.shape[1]
            idx = (jnp.arange(n)[None, :] - first[:, None]) % n
            pe = jnp.take_along_axis(pe, idx[:, :, None], axis=1)
            h = h + pe.astype(h.dtype)
        h = h + self.freq_emb(params["freq_emb"], freq.reshape(b, -1))
        s = h.shape[1]
        neg = jnp.finfo(jnp.float32).min
        bias = jnp.minimum(patch_pad[:, None, None, :] * neg,
                           jnp.triu(jnp.full((s, s), neg, jnp.float32), 1)[None, None])
        for i, layer in enumerate(self.layers):
            h = layer(params["layers"][str(i)], h, bias, patch_pad)
        return TimesFmOutput(last_hidden_state=h, loc=mu, scale=sigma)


class TimesFmModelForPrediction(TimesFmPreTrainedModel):
    """reference TimesFmModelForPrediction — AR horizon decode loop."""

    def __init__(self, config: TimesFmConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.decoder = TimesFmModel(config, dtype=self.dtype,
                                    param_dtype=self.param_dtype)
        self.horizon_ff_layer = TimesFmResidualBlock(
            config.hidden_size, config.intermediate_size,
            config.horizon_length * (1 + len(config.quantiles)), **kw)

    def _postprocess(self, params, hidden, mu, sigma):
        out = self.horizon_ff_layer(params["horizon_ff_layer"], hidden)
        b, n, _ = out.shape
        out = out.reshape(b, n, self.config.horizon_length,
                          len(self.config.quantiles) + 1)
        return out * sigma[:, None, None, None] + mu[:, None, None, None]

    def __call__(self, params, past_values=None, freq=None,
                 future_values=None, forecast_context_len=None,
                 **kwargs) -> TimesFmOutputForPrediction:
        cfg = self.config
        context_len = forecast_context_len or cfg.context_length
        # list-of-1d or array [B, T]
        series = [np.asarray(ts, np.float32) for ts in past_values]
        if freq is None:
            freq = [0] * len(series)
        input_ts, input_padding = [], []
        for ts in series:
            pad = np.zeros(len(ts) + cfg.horizon_length, np.float32)
            if len(ts) < cfg.context_length:
                front = cfg.context_length - len(ts)
                ts = np.concatenate([np.zeros(front, np.float32), ts])
                pad = np.concatenate([np.ones(front, np.float32), pad])
            elif len(ts) > cfg.context_length:
                ts = ts[-cfg.context_length:]
                pad = pad[-(cfg.context_length + cfg.horizon_length):]
            input_ts.append(ts)
            input_padding.append(pad)
        final_out = jnp.asarray(np.stack(input_ts))
        padding = jnp.asarray(np.stack(input_padding))
        freq_arr = jnp.asarray(np.asarray(freq, np.int32).reshape(-1, 1))

        out_patch = cfg.horizon_length
        steps = (cfg.horizon_length + out_patch - 1) // out_patch
        full = []
        for _ in range(steps):
            cur_pad = padding[:, : final_out.shape[1]]
            ts_in = final_out[:, -context_len:]
            pad_in = cur_pad[:, -context_len:]
            dec = self.decoder(params["decoder"], past_values=ts_in,
                               past_values_padding=pad_in, freq=freq_arr)
            post = self._postprocess(params, dec.last_hidden_state,
                                     dec.loc, dec.scale)
            new_ts = post[:, -1, :out_patch, 0]
            full.append(post[:, -1, :out_patch, :])
            final_out = jnp.concatenate([final_out, new_ts], axis=-1)
        full_predictions = jnp.concatenate(full, axis=1)[:, : cfg.horizon_length]
        mean_predictions = full_predictions[:, :, 0]
        loss = None
        if future_values is not None:
            target = jnp.asarray(future_values)
            mse = jnp.mean((mean_predictions - target) ** 2)
            qlosses = []
            for i, q in enumerate(cfg.quantiles):
                err = target - full_predictions[:, :, 1 + i]
                qlosses.append(jnp.mean(jnp.maximum((q - 1) * err, q * err)))
            loss = mse + jnp.mean(jnp.stack(qlosses))
        return TimesFmOutputForPrediction(mean_predictions=mean_predictions,
                                          full_predictions=full_predictions,
                                          loss=loss)
