"""PatchTSMixer (reference models/patchtsmixer/modeling_patchtsmixer.py):
all-MLP time-series mixer — per-channel std/mean scaling, patchify, then
stacked (channel-mix / patch-mix / feature-mix) gated MLP blocks; MSE
forecasting head flattens patches per channel."""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core.module import LayerNorm, Linear, Module
from ...modeling_outputs import ModelOutput
from ...modeling_utils import PreTrainedModel
from .configuration_patchtsmixer import PatchTSMixerConfig


@dataclass
class PatchTSMixerModelOutput(ModelOutput):
    last_hidden_state: Optional[jnp.ndarray] = None
    patch_input: Optional[jnp.ndarray] = None
    loc: Optional[jnp.ndarray] = None
    scale: Optional[jnp.ndarray] = None


@dataclass
class PatchTSMixerForPredictionOutput(ModelOutput):
    loss: Optional[jnp.ndarray] = None
    prediction_outputs: Optional[jnp.ndarray] = None
    last_hidden_state: Optional[jnp.ndarray] = None
    loc: Optional[jnp.ndarray] = None
    scale: Optional[jnp.ndarray] = None


class _GatedAttention(Module):
    def __init__(self, size, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.attn_layer = Linear(size, size, True, dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, x):
        w = jax.nn.softmax(self.attn_layer(params["attn_layer"], x), axis=-1)
        return x * w


class _MixerMLP(Module):
    def __init__(self, in_f, out_f, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.fc1 = Linear(in_f, in_f * config.expansion_factor, True, **kw)
        self.fc2 = Linear(in_f * config.expansion_factor, out_f, True, **kw)

    def __call__(self, params, x):
        h = jax.nn.gelu(self.fc1(params["fc1"], x), approximate=False)
        return self.fc2(params["fc2"], h)


class _NormLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        # "batch" norm variant not exercised by shipped checkpoints; LayerNorm
        # is the reference default (norm_mlp="LayerNorm")
        self.norm = LayerNorm(config.d_model, config.norm_eps,
                              dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, x):
        return self.norm(params["norm"], x)


class _PatchMixerBlock(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.norm = _NormLayer(config, **kw)
        self.gated_attn = config.gated_attn
        self.mlp = _MixerMLP(config.num_patches, config.num_patches, config, **kw)
        if config.gated_attn:
            self.gating_block = _GatedAttention(config.num_patches, **kw)

    def __call__(self, params, x):
        residual = x
        h = self.norm(params["norm"], x)
        h = jnp.swapaxes(h, -1, -2)
        h = self.mlp(params["mlp"], h)
        if self.gated_attn:
            h = self.gating_block(params["gating_block"], h)
        h = jnp.swapaxes(h, -1, -2)
        return h + residual


class _FeatureMixerBlock(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.norm = _NormLayer(config, **kw)
        self.gated_attn = config.gated_attn
        self.mlp = _MixerMLP(config.d_model, config.d_model, config, **kw)
        if config.gated_attn:
            self.gating_block = _GatedAttention(config.d_model, **kw)

    def __call__(self, params, x):
        residual = x
        h = self.norm(params["norm"], x)
        h = self.mlp(params["mlp"], h)
        if self.gated_attn:
            h = self.gating_block(params["gating_block"], h)
        return h + residual


class _ChannelFeatureMixerBlock(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.norm = _NormLayer(config, **kw)
        self.gated_attn = config.gated_attn
        self.mlp = _MixerMLP(config.num_input_channels,
                             config.num_input_channels, config, **kw)
        if config.gated_attn:
            self.gating_block = _GatedAttention(config.num_input_channels, **kw)

    def __call__(self, params, x):  # [B, C, N, D]
        residual = x
        h = self.norm(params["norm"], x)
        h = h.transpose(0, 3, 2, 1)
        if self.gated_attn:
            h = self.gating_block(params["gating_block"], h)
        h = self.mlp(params["mlp"], h)
        h = h.transpose(0, 3, 2, 1)
        return h + residual


class _MixerLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.patch_mixer = _PatchMixerBlock(config, **kw)
        self.feature_mixer = _FeatureMixerBlock(config, **kw)
        self.mode = config.mode
        if config.mode == "mix_channel":
            self.channel_feature_mixer = _ChannelFeatureMixerBlock(config, **kw)

    def __call__(self, params, x):
        if self.mode == "mix_channel":
            x = self.channel_feature_mixer(params["channel_feature_mixer"], x)
        x = self.patch_mixer(params["patch_mixer"], x)
        return self.feature_mixer(params["feature_mixer"], x)


class _MixerBlock(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.mixers = [_MixerLayer(config, dtype=dtype, param_dtype=param_dtype)
                       for _ in range(config.num_layers)]

    def __call__(self, params, x):
        for i, mixer in enumerate(self.mixers):
            x = mixer(params["mixers"][str(i)], x)
        return x


class PatchTSMixerEncoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.patcher = Linear(config.patch_length, config.d_model, True, **kw)
        self.mlp_mixer_encoder = _MixerBlock(config, **kw)

    def init(self, rng):
        params = super().init(rng)
        if self.config.use_positional_encoding:
            cfg = self.config
            if cfg.positional_encoding_type == "sincos":
                pe = np.zeros((cfg.num_patches, cfg.d_model))
                pos = np.arange(cfg.num_patches)[:, None]
                div = np.exp(np.arange(0, cfg.d_model, 2)
                             * -(math.log(10000.0) / cfg.d_model))
                pe[:, 0::2] = np.sin(pos * div)
                pe[:, 1::2] = np.cos(pos * div)
                pe = pe - pe.mean()
                pe = pe / (pe.std(ddof=1) * 10)
            else:
                pe = np.asarray(jax.random.normal(
                    rng, (cfg.num_patches, cfg.d_model)))
            params["positional_encoder"] = {
                "position_enc": jnp.asarray(pe, self.param_dtype)}
        return params

    def __call__(self, params, patches):
        h = self.patcher(params["patcher"], patches)
        if self.config.use_positional_encoding:
            h = h + params["positional_encoder"]["position_enc"].astype(h.dtype)
        return self.mlp_mixer_encoder(params["mlp_mixer_encoder"], h)


class PatchTSMixerPreTrainedModel(PreTrainedModel):
    config_class = PatchTSMixerConfig
    base_model_prefix = "model"
    main_input_name = "past_values"


def _std_scale(config, data, observed):
    denom = jnp.maximum(observed.sum(axis=1, keepdims=True), 1.0)
    loc = (data * observed).sum(axis=1, keepdims=True) / denom
    var = (((data - loc) * observed) ** 2).sum(axis=1, keepdims=True) / denom
    scale = jnp.sqrt(var + 1e-5)
    return (data - loc) / scale, loc, scale


def _mean_scale(config, data, observed):
    ts_sum = jnp.abs(data * observed).sum(axis=1, keepdims=True)
    n = observed.sum(axis=1, keepdims=True)
    scale = ts_sum / jnp.maximum(n, 1)
    default = ts_sum.sum(axis=0) / jnp.maximum(n.sum(axis=0), 1)
    scale = jnp.where(n > 0, scale, default)
    scale = jnp.maximum(scale, 1e-10)
    return data / scale, jnp.zeros_like(scale), scale


class PatchTSMixerModel(PatchTSMixerPreTrainedModel):
    def __init__(self, config: PatchTSMixerConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.encoder = PatchTSMixerEncoder(config, dtype=self.dtype,
                                           param_dtype=self.param_dtype)

    def _patchify(self, x):  # [B, S, C] -> [B, C, N, P]
        cfg = self.config
        num_patches = cfg.num_patches
        new_len = cfg.patch_length + cfg.patch_stride * (num_patches - 1)
        x = x[:, cfg.context_length - new_len:, :]
        idx = (np.arange(num_patches)[:, None] * cfg.patch_stride
               + np.arange(cfg.patch_length)[None, :])
        out = x[:, idx, :]                       # [B, N, P, C]
        return out.transpose(0, 3, 1, 2)         # [B, C, N, P]

    def __call__(self, params, past_values=None, observed_mask=None,
                 **kwargs) -> PatchTSMixerModelOutput:
        x = jnp.asarray(past_values, self.dtype)
        if x.ndim == 2:  # univariate convenience: [B, S] -> [B, S, 1]
            x = x[..., None]
        if observed_mask is None:
            observed_mask = jnp.ones_like(x)
        scaling = self.config.scaling
        if scaling == "mean":
            scaled, loc, scale = _mean_scale(self.config, x, observed_mask)
        elif scaling in ("std", True):
            scaled, loc, scale = _std_scale(self.config, x, observed_mask)
        else:
            scaled = x
            loc = jnp.zeros_like(x[:, :1])
            scale = jnp.ones_like(x[:, :1])
        patched = self._patchify(scaled)
        h = self.encoder(params["encoder"], patched)
        return PatchTSMixerModelOutput(last_hidden_state=h, patch_input=patched,
                                       loc=loc, scale=scale)


class PatchTSMixerForPrediction(PatchTSMixerPreTrainedModel):
    """MSE-loss forecasting head (reference PatchTSMixerForPrediction with
    loss="mse"; the student-t distribution head is a hub-rare variant)."""

    def __init__(self, config: PatchTSMixerConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.model = PatchTSMixerModel(config, dtype=self.dtype,
                                       param_dtype=self.param_dtype)
        self.head = _PredictionHead(config, **kw)

    def __call__(self, params, past_values=None, observed_mask=None,
                 future_values=None, **kwargs) -> PatchTSMixerForPredictionOutput:
        out = self.model(params["model"], past_values=past_values,
                         observed_mask=observed_mask)
        y_hat = self.head(params["head"], out.last_hidden_state)
        cfg = self.config
        idx = cfg.prediction_channel_indices
        loc, scale = out.loc, out.scale
        if idx is not None:
            loc = loc[..., idx]
            scale = scale[..., idx]
        y_hat = y_hat * scale + loc
        loss = None
        if future_values is not None:
            target = jnp.asarray(future_values)
            if idx is not None:
                target = target[..., idx]
            loss = jnp.mean((y_hat - target) ** 2)
        return PatchTSMixerForPredictionOutput(
            loss=loss, prediction_outputs=y_hat,
            last_hidden_state=out.last_hidden_state, loc=out.loc, scale=out.scale)


class _PredictionHead(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.base_forecast_block = Linear(
            config.num_patches * config.d_model, config.prediction_length, True,
            dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, hidden):  # [B, C, N, D]
        b, c = hidden.shape[:2]
        flat = hidden.reshape(b, c, -1)
        fc = self.base_forecast_block(params["base_forecast_block"], flat)
        fc = jnp.swapaxes(fc, -1, -2)    # [B, pred_len, C]
        idx = self.config.prediction_channel_indices
        if idx is not None:
            fc = fc[..., sorted(idx)]
        return fc
