"""TimesFM 2.5 (reference models/timesfm2_5/modular_timesfm2_5.py).

Patched-decoder forecaster, restructured from TimesFM 2.0:
- per-patch RUNNING normalization (Welford over patches, reference
  _update_running_stats) instead of one masked mean/std; the tokenizer input
  is [normed_patch | mask] through a biased residual block
- llama-style attention with rope, per-head qk RMSNorm applied AFTER rope,
  and a learned per-dimension softplus query scale ×log2(e)/sqrt(d)
  (reference :137-178); position ids shift past left padding
- four-norm decoder block (input/post_attention + pre/post feedforward)
- TWO output heads: a point head emitting horizon_length×(Q+1) per patch and
  a continuous-quantile head emitting output_quantile_len×(Q+1); non-median
  quantiles are stitched as spread offsets around the median (reference
  :478-489); optional flip-invariance averaging and non-negative clamping
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core.module import Linear, Module, RMSNorm, normal_init
from ...modeling_outputs import ModelOutput
from ...ops.rope import compute_cos_sin, rope_inv_freq, apply_rotary_pos_emb
from ..timesfm.modeling_timesfm import TimesFmPreTrainedModel
from .configuration_timesfm2_5 import TimesFm2_5Config


@dataclass
class TimesFm2_5Output(ModelOutput):
    last_hidden_state: Optional[jnp.ndarray] = None
    loc: Optional[jnp.ndarray] = None
    scale: Optional[jnp.ndarray] = None
    context_mu: Optional[jnp.ndarray] = None
    context_sigma: Optional[jnp.ndarray] = None


@dataclass
class TimesFm2_5OutputForPrediction(ModelOutput):
    mean_predictions: Optional[jnp.ndarray] = None
    full_predictions: Optional[jnp.ndarray] = None
    loss: Optional[jnp.ndarray] = None


def _act(name):
    return jax.nn.silu if name in ("swish", "silu") else jax.nn.gelu


class TimesFm2_5ResidualBlock(Module):
    """Residual block with configurable bias/activation (reference :118)."""

    def __init__(self, config, input_dims, hidden_dims, output_dims,
                 use_bias=None, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        bias = config.use_bias if use_bias is None else use_bias
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.input_layer = Linear(input_dims, hidden_dims, bias, **kw)
        self.output_layer = Linear(hidden_dims, output_dims, bias, **kw)
        self.residual_layer = Linear(input_dims, output_dims, bias, **kw)
        self.act = _act(config.activation)

    def __call__(self, params, x):
        h = self.act(self.input_layer(params["input_layer"], x))
        return (self.output_layer(params["output_layer"], h)
                + self.residual_layer(params["residual_layer"], x))


class TimesFm2_5Attention(Module):
    """Rope → per-head qk RMSNorm → learned per-dim query scale (reference :137)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.num_heads = config.num_attention_heads
        self.num_kv_heads = config.num_key_value_heads
        self.head_dim = config.head_dim
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        h = config.hidden_size
        self.q_proj = Linear(h, self.num_heads * self.head_dim, config.attention_bias, **kw)
        self.k_proj = Linear(h, self.num_kv_heads * self.head_dim, config.attention_bias, **kw)
        self.v_proj = Linear(h, self.num_kv_heads * self.head_dim, config.attention_bias, **kw)
        self.o_proj = Linear(self.num_heads * self.head_dim, h, config.attention_bias, **kw)
        nkw = dict(dtype=dtype, param_dtype=param_dtype)
        self.q_norm = RMSNorm(self.head_dim, config.rms_norm_eps, **nkw)
        self.k_norm = RMSNorm(self.head_dim, config.rms_norm_eps, **nkw)

    def init(self, rng):
        params = super().init(rng)
        params["scaling"] = jnp.zeros((self.head_dim,), self.param_dtype)
        return params

    def __call__(self, params, hidden, cos, sin, bias):
        b, s, _ = hidden.shape
        q = self.q_proj(params["q_proj"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        k = self.k_proj(params["k_proj"], hidden).reshape(b, s, self.num_kv_heads, self.head_dim)
        v = self.v_proj(params["v_proj"], hidden).reshape(b, s, self.num_kv_heads, self.head_dim)
        q, k = apply_rotary_pos_emb(q, k, cos, sin)
        q = self.q_norm(params["q_norm"], q)
        k = self.k_norm(params["k_norm"], k)
        scale = jax.nn.softplus(params["scaling"].astype(jnp.float32)) \
            * (1.442695041 / math.sqrt(self.head_dim))
        q = q * scale[None, None, None, :].astype(q.dtype)
        r = self.num_heads // self.num_kv_heads
        if r > 1:
            k = jnp.repeat(k, r, axis=2)
            v = jnp.repeat(v, r, axis=2)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                            k.astype(jnp.float32))
        probs = jax.nn.softmax(logits + bias, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
        return self.o_proj(params["o_proj"], out.reshape(b, s, -1))


class TimesFm2_5MLP(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.fc1 = Linear(config.hidden_size, config.intermediate_size, config.use_bias, **kw)
        self.fc2 = Linear(config.intermediate_size, config.hidden_size, config.use_bias, **kw)
        self.act = _act(config.activation)

    def __call__(self, params, x):
        return self.fc2(params["fc2"], self.act(self.fc1(params["fc1"], x)))


class TimesFm2_5DecoderLayer(Module):
    """Four-norm block (reference :180-202)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.self_attn = TimesFm2_5Attention(config, **kw)
        self.mlp = TimesFm2_5MLP(config, **kw)
        for n in ("input_layernorm", "post_attention_layernorm",
                  "pre_feedforward_layernorm", "post_feedforward_layernorm"):
            setattr(self, n, RMSNorm(config.hidden_size, config.rms_norm_eps, **kw))

    def __call__(self, params, hidden, cos, sin, bias):
        residual = hidden
        h = self.input_layernorm(params["input_layernorm"], hidden)
        h = self.self_attn(params["self_attn"], h, cos, sin, bias)
        hidden = self.post_attention_layernorm(params["post_attention_layernorm"], h) + residual
        residual = hidden
        h = self.pre_feedforward_layernorm(params["pre_feedforward_layernorm"], hidden)
        h = self.mlp(params["mlp"], h)
        return self.post_feedforward_layernorm(params["post_feedforward_layernorm"], h) + residual


class TimesFm2_5Model(TimesFmPreTrainedModel):
    config_class = TimesFm2_5Config
    _tolerance = 1e-6

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.input_ff_layer = TimesFm2_5ResidualBlock(
            config, 2 * config.patch_length, config.hidden_size,
            config.hidden_size, use_bias=True, **kw)
        self.layers = [TimesFm2_5DecoderLayer(config, **kw)
                       for _ in range(config.num_hidden_layers)]
        self.inv_freq, self.attention_scaling = rope_inv_freq(config)

    def _revin(self, x, loc, scale, reverse=False, mask=None):
        while loc.ndim < x.ndim:
            loc = loc[..., None]
            scale = scale[..., None]
        safe = jnp.where(scale < self._tolerance, 1.0, scale)
        if reverse:
            return x * scale + loc
        normed = (x - loc) / safe
        if mask is not None:
            normed = jnp.where(mask, 0.0, normed)
        return normed

    @staticmethod
    def _update_running_stats(count, mean, std, new_values, mask):
        """Welford combine (reference :262-293). mask True = invalid."""
        valid = (~mask).astype(new_values.dtype)
        inc_n = valid.sum(-1)
        inc_n_safe = jnp.where(inc_n == 0, 1.0, inc_n)
        inc_mean = (new_values * valid).sum(-1) / inc_n_safe
        inc_mean = jnp.where(inc_n == 0, 0.0, inc_mean)
        centered = new_values - inc_mean[..., None]
        inc_var = ((centered * valid) ** 2).sum(-1) / inc_n_safe
        inc_var = jnp.where(inc_n == 0, 0.0, inc_var)
        inc_std = jnp.sqrt(jnp.maximum(inc_var, 0.0))
        new_n = count + inc_n
        new_n_safe = jnp.where(new_n == 0, 1.0, new_n)
        new_mean = (count * mean + inc_mean * inc_n) / new_n_safe
        new_mean = jnp.where(new_n == 0, 0.0, new_mean)
        new_var = (count * std**2 + inc_n * inc_std**2
                   + count * (mean - new_mean)**2
                   + inc_n * (inc_mean - new_mean)**2) / new_n_safe
        new_var = jnp.where(new_n == 0, 0.0, new_var)
        return new_n, new_mean, jnp.sqrt(jnp.maximum(new_var, 0.0))

    def __call__(self, params, past_values=None, past_values_padding=None,
                 **kwargs) -> TimesFm2_5Output:
        cfg = self.config
        b, seq_len = past_values.shape
        if past_values_padding is None:
            past_values_padding = jnp.zeros_like(past_values)
        patches = past_values.reshape(b, -1, cfg.patch_length)
        masks = (past_values_padding[:, :seq_len]
                 .reshape(b, -1, cfg.patch_length) >= 0.5)

        def step(carry, xs):
            count, mean, std = carry
            vals, m = xs
            count, mean, std = self._update_running_stats(count, mean, std, vals, m)
            return (count, mean, std), (mean, std)

        init = (jnp.zeros((b,)), jnp.zeros((b,)), jnp.zeros((b,)))
        _, (mu_hist, sigma_hist) = jax.lax.scan(
            step, init, (jnp.swapaxes(patches, 0, 1), jnp.swapaxes(masks, 0, 1)))
        context_mu = jnp.swapaxes(mu_hist, 0, 1)      # [B, N]
        context_sigma = jnp.swapaxes(sigma_hist, 0, 1)

        normed = self._revin(patches, context_mu, context_sigma, mask=masks)
        tok = jnp.concatenate([normed, masks.astype(normed.dtype)], axis=-1)
        h = self.input_ff_layer(params["input_ff_layer"], tok)

        patch_pad = masks[..., -1]  # [B, N]
        n = h.shape[1]
        num_masked = patch_pad.astype(jnp.int32).sum(-1, keepdims=True)
        position_ids = jnp.arange(n, dtype=jnp.int32)[None, :] - num_masked
        cos, sin = compute_cos_sin(position_ids, self.inv_freq,
                                   self.attention_scaling, dtype=self.dtype)
        neg = jnp.finfo(jnp.float32).min
        bias = jnp.minimum(
            patch_pad.astype(jnp.float32)[:, None, None, :] * neg,
            jnp.triu(jnp.full((n, n), neg, jnp.float32), 1)[None, None])
        for i, layer in enumerate(self.layers):
            h = layer(params["layers"][str(i)], h, cos, sin, bias)
        return TimesFm2_5Output(
            last_hidden_state=h,
            loc=context_mu[:, -1],
            scale=jnp.maximum(context_sigma[:, -1], self._tolerance),
            context_mu=context_mu, context_sigma=context_sigma)


class TimesFm2_5ModelForPrediction(TimesFmPreTrainedModel):
    config_class = TimesFm2_5Config

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.model = TimesFm2_5Model(config, dtype=self.dtype,
                                     param_dtype=self.param_dtype)
        nq = len(config.quantiles) + 1
        self.output_projection_point = TimesFm2_5ResidualBlock(
            config, config.hidden_size, config.hidden_size,
            config.horizon_length * nq, **kw)
        self.output_projection_quantiles = TimesFm2_5ResidualBlock(
            config, config.hidden_size, config.hidden_size,
            config.output_quantile_len * nq, **kw)

    def _decode_and_project(self, params, normalized_ts, input_padding):
        cfg = self.config
        out = self.model(params["model"], past_values=normalized_ts,
                         past_values_padding=input_padding)
        h = out.last_hidden_state
        nq = len(cfg.quantiles) + 1
        point = self.model._revin(
            self.output_projection_point(params["output_projection_point"], h),
            out.context_mu, out.context_sigma, reverse=True)
        quant = self.model._revin(
            self.output_projection_quantiles(
                params["output_projection_quantiles"], h),
            out.context_mu, out.context_sigma, reverse=True)
        b, n = point.shape[:2]
        point = point.reshape(b, n, cfg.horizon_length, nq)[:, -1]
        quant = quant.reshape(b, n, cfg.output_quantile_len, nq)[:, -1]
        return point, quant, out

    def __call__(self, params, past_values=None, future_values=None,
                 forecast_context_len=None, truncate_negative=None,
                 force_flip_invariance=None, **kwargs):
        cfg = self.config
        context_len = forecast_context_len or cfg.context_length
        series = [np.asarray(ts, np.float32) for ts in past_values]
        input_min = min(float(np.min(ts)) for ts in series)
        if truncate_negative is None:
            truncate_negative = cfg.infer_is_positive
        if force_flip_invariance is None:
            force_flip_invariance = cfg.force_flip_invariance
        ts_rows, pad_rows = [], []
        for ts in series:
            ts = ts[-context_len:]
            pad = np.zeros(len(ts), np.float32)
            if len(ts) < context_len:
                front = context_len - len(ts)
                ts = np.concatenate([np.zeros(front, np.float32), ts])
                pad = np.concatenate([np.ones(front, np.float32), pad])
            ts_rows.append(ts)
            pad_rows.append(pad)
        input_ts = jnp.asarray(np.stack(ts_rows))
        input_padding = jnp.asarray(np.stack(pad_rows))
        mu_g = input_ts.mean(axis=1, keepdims=True)
        sigma_g = input_ts.std(axis=1, keepdims=True)
        normalized = self.model._revin(input_ts, mu_g, sigma_g)

        pf, qs, out = self._decode_and_project(params, normalized, input_padding)
        if force_flip_invariance:
            fpf, fqs, _ = self._decode_and_project(params, -normalized,
                                                   input_padding)

            def flipq(x):
                return jnp.concatenate([x[..., :1], x[..., 1:][..., ::-1]], -1)

            pf = (pf - flipq(fpf)) / 2
            qs = (qs - flipq(fqs)) / 2

        horizon = min(cfg.horizon_length, pf.shape[1])
        full = pf[:, :horizon, :]
        median = min(cfg.decode_index, full.shape[-1] - 1)
        if cfg.use_continuous_quantile_head:
            mqh = min(horizon, qs.shape[1])
            cols = []
            for idx in range(full.shape[-1]):
                if idx == 0 or idx == median or idx > len(cfg.quantiles):
                    cols.append(full[:, :, idx])
                else:
                    stitched = (qs[:, :mqh, idx] - qs[:, :mqh, median]
                                + full[:, :mqh, median])
                    col = full[:, :, idx]
                    col = col.at[:, :mqh].set(stitched) if mqh < horizon else stitched
                    cols.append(col)
            full = jnp.stack(cols, axis=-1)
        full_predictions = self.model._revin(full, mu_g[:, :, None],
                                             sigma_g[:, :, None], reverse=True)
        decode_index = min(cfg.decode_index, full_predictions.shape[-1] - 1)
        mean_predictions = full_predictions[:, :, decode_index]
        if truncate_negative and input_min >= 0:
            mean_predictions = jnp.maximum(mean_predictions, 0.0)
            full_predictions = jnp.maximum(full_predictions, 0.0)
        loss = None
        if future_values is not None:
            target = jnp.asarray(future_values)[:, :horizon]
            normed_preds = full[:, : target.shape[1]]
            normed_target = self.model._revin(target, mu_g, sigma_g)
            mse = jnp.mean((normed_preds[:, :, decode_index] - normed_target) ** 2)
            qloss = 0.0
            nq_cols = [i for i in range(normed_preds.shape[-1]) if i != decode_index]
            for i in nq_cols:
                qv = cfg.quantiles[min(i - 1, len(cfg.quantiles) - 1)] if i else 0.5
                err = normed_target - normed_preds[:, :, i]
                qloss = qloss + jnp.mean(jnp.maximum((qv - 1) * err, qv * err))
            loss = mse + qloss / max(len(nq_cols), 1)
        return TimesFm2_5OutputForPrediction(
            mean_predictions=mean_predictions,
            full_predictions=full_predictions, loss=loss)
