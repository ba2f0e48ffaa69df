"""Autoformer, TPU-native (reference src/transformers/models/autoformer/modeling_autoformer.py).

Decomposition forecasting on the TimeSeriesTransformer skeleton:
- **Series decomposition**: moving-average split of every sublayer output
  into seasonal + trend streams (edge-replicated avg-pool — one
  reduce_window, no dynamic shapes).
- **Auto-correlation attention**: QK^T is replaced by the circular
  auto-correlation computed with rFFT→conj-multiply→irFFT (XLA lowers FFTs
  natively), then top-k delay aggregation with a static k.
- The decoder runs ONCE over [label_length seasonal context | zeros] and
  emits seasonality + trend; `generate` is therefore single-shot sampling.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ...core.module import Conv, LayerNorm, Linear, Module, normal_init
from ...time_series_utils import weighted_average
from ..bart.modeling_bart import BartAttention
from ..time_series_transformer.modeling_time_series_transformer import (
    SampleTSPredictionOutput, Seq2SeqTSPredictionOutput,
    TimeSeriesFeatureEmbedder, TimeSeriesTransformerForPrediction,
    TimeSeriesTransformerModel, TimeSeriesTransformerPreTrainedModel,
    _TSDecoder, _TSEncoder, _ValueEmbedding)
from .configuration_autoformer import AutoformerConfig


def series_decomp(x, kernel_size: int):
    """Moving-average trend + seasonal residual (reference
    AutoformerSeriesDecompositionLayer)."""
    pads = (kernel_size - 1) // 2
    front = jnp.repeat(x[:, :1], pads, axis=1)
    end = jnp.repeat(x[:, -1:], pads, axis=1)
    padded = jnp.concatenate([front, x, end], axis=1)
    trend = jax.lax.reduce_window(
        padded, 0.0, jax.lax.add, (1, kernel_size, 1), (1, 1, 1),
        [(0, 0), (0, 0), (0, 0)]) / kernel_size
    return x - trend, trend


class AutoformerLayernorm(Module):
    """LN minus its per-sequence mean (reference AutoformerLayernorm)."""

    def __init__(self, d_model, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.layernorm = LayerNorm(d_model, 1e-5, dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, x):
        x_hat = self.layernorm(params["layernorm"], x)
        return x_hat - x_hat.mean(axis=1, keepdims=True)


class AutoformerAttention(BartAttention):
    """Auto-correlation "attention" (reference AutoformerAttention): FFT
    cross-correlation of q/k over time, softmax over the top-k delays, and
    delay-rolled aggregation of v.  Replicates the reference eval path
    exactly — including its head-major delay-index tiling."""

    def __init__(self, embed_dim, num_heads, config, factor, *, dtype, param_dtype):
        super().__init__(embed_dim, num_heads, config, dtype=dtype,
                         param_dtype=param_dtype)
        self.factor = factor

    def __call__(self, params, hidden, attn_args=None, kv_precomputed=None,
                 cache=None, layer_idx=0, cache_position=0, kv_hidden=None):
        b, tgt, e = hidden.shape
        q = self.q_proj(params["q_proj"], hidden)  # NOT scaled (reference)
        q = q.reshape(b, tgt, self.num_heads, self.head_dim)
        src = kv_hidden if kv_hidden is not None else hidden
        k, v = self.kv(params, src)
        bh = b * self.num_heads
        q = q.transpose(0, 2, 1, 3).reshape(bh, tgt, self.head_dim)
        k = k.transpose(0, 2, 1, 3).reshape(bh, -1, self.head_dim)
        v = v.transpose(0, 2, 1, 3).reshape(bh, -1, self.head_dim)

        q_len, kv_len = q.shape[1], v.shape[1]
        if q_len > kv_len:
            q = q[:, : q_len - kv_len]
            zeros = jnp.zeros_like(q)
            v = jnp.concatenate([v, zeros], axis=1)
            k = jnp.concatenate([k, zeros], axis=1)
        else:
            v = v[:, :q_len]
            k = k[:, :q_len]

        qf = jnp.fft.rfft(q.astype(jnp.float32), n=tgt, axis=1)
        kf = jnp.fft.rfft(k.astype(jnp.float32), n=tgt, axis=1)
        autocorr = jnp.fft.irfft(qf * jnp.conj(kf), n=tgt, axis=1)  # [bh, tgt, hd]

        time_length = v.shape[1]
        top_k = int(self.factor * math.log(time_length))
        acorr_b = autocorr.reshape(b, self.num_heads, tgt, self.head_dim)
        mean_corr = acorr_b.mean(axis=(1, 3))                        # [b, tgt]
        top_vals, top_idx = jax.lax.top_k(mean_corr, top_k)          # [b, k]
        top_weights = jax.nn.softmax(top_vals, axis=-1)

        tmp_values = jnp.concatenate([v, v], axis=1)
        init_index = jnp.broadcast_to(
            jnp.arange(time_length)[None, :, None],
            (bh, time_length, self.head_dim))
        agg = jnp.zeros_like(v, dtype=jnp.float32)
        for i in range(top_k):
            # reference tiles the [b] delay vector head-major over the
            # b*h rows (row j gets delay[j % b])
            delay_rows = jnp.tile(top_idx[:, i], self.num_heads)      # [bh]
            gather_idx = init_index + delay_rows[:, None, None]
            rolled = jnp.take_along_axis(tmp_values, gather_idx, axis=1)
            w_rows = jnp.tile(top_weights[:, i], self.num_heads)
            agg = agg + rolled.astype(jnp.float32) * w_rows[:, None, None]
        out = agg.astype(self.dtype).reshape(b, self.num_heads, tgt, self.head_dim)
        out = out.transpose(0, 2, 1, 3).reshape(b, tgt, e)
        return self.out_proj(params["out_proj"], out), cache


class AutoformerEncoderLayer(Module):
    def __init__(self, config: AutoformerConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.d_model
        self.self_attn = AutoformerAttention(d, config.encoder_attention_heads,
                                             config, config.autocorrelation_factor, **kw)
        self.self_attn_layer_norm = LayerNorm(d, 1e-5, **kw)
        self.fc1 = Linear(d, config.encoder_ffn_dim, True, **kw,
                          kernel_init=normal_init(config.init_std))
        self.fc2 = Linear(config.encoder_ffn_dim, d, True, **kw,
                          kernel_init=normal_init(config.init_std))
        self.final_layer_norm = AutoformerLayernorm(d, **kw)
        self.kernel_size = config.moving_average
        from ...ops.activations import get_activation

        self.act = get_activation(config.activation_function)

    def __call__(self, params, hidden, attn_args=None):
        h, _ = self.self_attn(params["self_attn"], hidden)
        hidden = self.self_attn_layer_norm(params["self_attn_layer_norm"], hidden + h)
        hidden, _ = series_decomp(hidden, self.kernel_size)
        h = self.fc2(params["fc2"], self.act(self.fc1(params["fc1"], hidden)))
        hidden, _ = series_decomp(hidden + h, self.kernel_size)
        return self.final_layer_norm(params["final_layer_norm"], hidden)


class AutoformerDecoderLayer(Module):
    def __init__(self, config: AutoformerConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.d_model
        heads = config.decoder_attention_heads
        self.self_attn = AutoformerAttention(d, heads, config,
                                             config.autocorrelation_factor, **kw)
        self.self_attn_layer_norm = LayerNorm(d, 1e-5, **kw)
        self.encoder_attn = AutoformerAttention(d, heads, config,
                                                config.autocorrelation_factor, **kw)
        self.encoder_attn_layer_norm = LayerNorm(d, 1e-5, **kw)
        self.fc1 = Linear(d, config.decoder_ffn_dim, True, **kw,
                          kernel_init=normal_init(config.init_std))
        self.fc2 = Linear(config.decoder_ffn_dim, d, True, **kw,
                          kernel_init=normal_init(config.init_std))
        self.final_layer_norm = AutoformerLayernorm(d, **kw)
        self.trend_projection = Conv(d, config.feature_size, 3, padding=0,
                                     use_bias=False, ndim=1, **kw)
        self.kernel_size = config.moving_average
        from ...ops.activations import get_activation

        self.act = get_activation(config.activation_function)

    def __call__(self, params, hidden, encoder_hidden):
        h, _ = self.self_attn(params["self_attn"], hidden)
        hidden, trend1 = series_decomp(hidden + h, self.kernel_size)
        hidden = self.self_attn_layer_norm(params["self_attn_layer_norm"], hidden)
        h, _ = self.encoder_attn(params["encoder_attn"], hidden,
                                 kv_hidden=encoder_hidden)
        hidden, trend2 = series_decomp(hidden + h, self.kernel_size)
        hidden = self.encoder_attn_layer_norm(params["encoder_attn_layer_norm"], hidden)
        h = self.fc2(params["fc2"], self.act(self.fc1(params["fc1"], hidden)))
        hidden, trend3 = series_decomp(hidden + h, self.kernel_size)
        hidden = self.final_layer_norm(params["final_layer_norm"], hidden)
        residual_trend = trend1 + trend2 + trend3
        rt = jnp.swapaxes(residual_trend, 1, 2)
        rt = jnp.pad(rt, ((0, 0), (0, 0), (1, 1)), mode="wrap")
        rt = self.trend_projection(params["trend_projection"], rt)
        return hidden, jnp.swapaxes(rt, 1, 2)


class AutoformerEncoder(_TSEncoder):
    layer_cls = AutoformerEncoderLayer


class AutoformerDecoder(Module):
    def __init__(self, config: AutoformerConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        from ..pegasus.modeling_pegasus import \
            PegasusSinusoidalPositionalEmbedding

        self.value_embedding = _ValueEmbedding(config, **kw)
        self.embed_positions = PegasusSinusoidalPositionalEmbedding(
            config.context_length + config.prediction_length, config.d_model, **kw)
        self.layers = [AutoformerDecoderLayer(config, **kw)
                       for _ in range(config.decoder_layers)]
        self.layernorm_embedding = LayerNorm(config.d_model, 1e-5, **kw)
        self.seasonality_projection = Linear(config.d_model, config.feature_size,
                                             True, **kw,
                                             kernel_init=normal_init(config.init_std))

    def __call__(self, params, inputs_embeds, trend, encoder_hidden):
        b, s, _ = inputs_embeds.shape
        h = self.value_embedding(params["value_embedding"], inputs_embeds)
        pos = self.embed_positions(
            params["embed_positions"],
            jnp.arange(s, dtype=jnp.int32)
            + (self.config.context_length - self.config.label_length))
        h = self.layernorm_embedding(params["layernorm_embedding"], h + pos[None])
        for i, layer in enumerate(self.layers):
            h, residual_trend = layer(params["layers"][str(i)], h, encoder_hidden)
            trend = trend + residual_trend
        return self.seasonality_projection(params["seasonality_projection"], h), trend


class AutoformerModel(TimeSeriesTransformerModel):
    encoder_cls = AutoformerEncoder
    decoder_cls = AutoformerDecoder

    def create_raw_inputs(self, params, past_values, past_time_features,
                          static_categorical_features=None,
                          static_real_features=None, past_observed_mask=None,
                          future_values=None, future_time_features=None):
        """Autoformer keeps lagged values and covariates separate
        (reference AutoformerModel.create_network_inputs)."""
        cfg = self.config
        tf_past = past_time_features[:, self._past_length - cfg.context_length:]
        time_feat = (jnp.concatenate([tf_past, future_time_features], axis=1)
                     if future_values is not None else tf_past)
        if past_observed_mask is None:
            past_observed_mask = jnp.ones_like(past_values)
        context = past_values[:, -cfg.context_length:]
        observed = past_observed_mask[:, -cfg.context_length:]
        _, loc, scale = self.scale(context, observed)
        inputs = ((jnp.concatenate([past_values, future_values], axis=1) - loc) / scale
                  if future_values is not None else (past_values - loc) / scale)
        if cfg.input_size == 1:
            log_abs_loc = jnp.log1p(jnp.abs(loc))
            log_scale = jnp.log(scale)
        else:
            log_abs_loc = jnp.log1p(jnp.abs(loc.squeeze(1)))
            log_scale = jnp.log(scale.squeeze(1))
        static_feat = jnp.concatenate([log_abs_loc, log_scale], axis=1)
        if static_real_features is not None:
            static_feat = jnp.concatenate([static_real_features, static_feat], axis=1)
        if static_categorical_features is not None:
            embedded = self.embedder(params["embedder"], static_categorical_features)
            static_feat = jnp.concatenate([embedded, static_feat], axis=1)
        expanded = jnp.broadcast_to(static_feat[:, None],
                                    (static_feat.shape[0], time_feat.shape[1],
                                     static_feat.shape[-1]))
        features = jnp.concatenate([expanded, time_feat], axis=-1)
        sub_len = (cfg.context_length + cfg.prediction_length
                   if future_values is not None else cfg.context_length)
        lagged = self.get_lagged_subsequences(inputs, sub_len)
        lagged = lagged.reshape(lagged.shape[0], lagged.shape[1], -1)
        return lagged, features, loc, scale, static_feat

    def __call__(self, params, past_values=None, past_time_features=None,
                 past_observed_mask=None, static_categorical_features=None,
                 static_real_features=None, future_values=None,
                 future_time_features=None, **kwargs):
        from ..time_series_transformer.modeling_time_series_transformer import \
            Seq2SeqTSModelOutput

        cfg = self.config
        lagged, features, loc, scale, static_feat = self.create_raw_inputs(
            params, past_values, past_time_features, static_categorical_features,
            static_real_features, past_observed_mask, future_values,
            future_time_features)
        enc_input = jnp.concatenate(
            [lagged[:, :cfg.context_length], features[:, :cfg.context_length]],
            axis=-1)
        enc_hidden = self.encoder(params["encoder"], enc_input)
        dec_hidden = None
        trend = None
        if future_values is not None:
            seasonal, trend_part = series_decomp(lagged[:, :cfg.context_length],
                                                 cfg.moving_average)
            mean = jnp.broadcast_to(
                lagged[:, :cfg.context_length].mean(axis=1, keepdims=True),
                (lagged.shape[0], cfg.prediction_length, lagged.shape[2]))
            zeros = jnp.zeros((lagged.shape[0], cfg.prediction_length,
                               lagged.shape[2]), lagged.dtype)
            dec_feats = features[:, cfg.context_length - cfg.label_length:]
            decoder_input = jnp.concatenate(
                [jnp.concatenate([seasonal[:, -cfg.label_length:], zeros], axis=1),
                 dec_feats], axis=-1)
            trend_init = jnp.concatenate(
                [jnp.concatenate([trend_part[:, -cfg.label_length:], mean], axis=1),
                 dec_feats], axis=-1)
            dec_hidden, trend = self.decoder(params["decoder"], decoder_input,
                                             trend_init, enc_hidden)
        return Seq2SeqTSModelOutput(last_hidden_state=dec_hidden,
                                    encoder_last_hidden_state=enc_hidden,
                                    loc=loc, scale=scale,
                                    static_features=static_feat), trend


class AutoformerPreTrainedModel(TimeSeriesTransformerPreTrainedModel):
    config_class = AutoformerConfig


class AutoformerModelStandalone(AutoformerPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.model = AutoformerModel(config, dtype=self.dtype,
                                     param_dtype=self.param_dtype)

    def __call__(self, params, **kwargs):
        out, _ = self.model(params["model"], **kwargs)
        return out


class AutoformerForPrediction(TimeSeriesTransformerForPrediction):
    """reference AutoformerForPrediction — parameter projection runs over
    feature_size (seasonality + trend sum), decoder is single-shot."""

    config_class = AutoformerConfig
    model_cls = AutoformerModel

    def __init__(self, config: AutoformerConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        # re-project from feature_size, not d_model
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.parameter_projection = self.distribution_output.get_parameter_projection(
            config.feature_size, **kw)

    def output_params(self, params, decoder_output):
        raw = self.parameter_projection(
            params["parameter_projection"],
            decoder_output[:, -self.config.prediction_length:])
        return self.distribution_output.domain_map(*raw)

    def __call__(self, params, past_values=None, past_time_features=None,
                 past_observed_mask=None, static_categorical_features=None,
                 static_real_features=None, future_values=None,
                 future_time_features=None, future_observed_mask=None,
                 **kwargs) -> Seq2SeqTSPredictionOutput:
        outputs, trend = self.model(params["model"], past_values=past_values,
                                    past_time_features=past_time_features,
                                    past_observed_mask=past_observed_mask,
                                    static_categorical_features=static_categorical_features,
                                    static_real_features=static_real_features,
                                    future_values=future_values,
                                    future_time_features=future_time_features)
        loss = None
        distr_args = None
        if future_values is not None:
            distr_args = self.output_params(params,
                                            outputs.last_hidden_state + trend)
            distr = self.output_distribution(distr_args, loc=outputs.loc,
                                             scale=outputs.scale)
            nll_vals = -distr.log_prob(future_values)
            if future_observed_mask is None:
                future_observed_mask = jnp.ones_like(future_values)
            if len(self.target_shape) == 0:
                loss_weights = future_observed_mask
            else:
                loss_weights = future_observed_mask.min(axis=-1)
            loss = weighted_average(nll_vals, weights=loss_weights)
        return Seq2SeqTSPredictionOutput(
            loss=loss, params=distr_args,
            encoder_last_hidden_state=outputs.encoder_last_hidden_state,
            loc=outputs.loc, scale=outputs.scale,
            static_features=outputs.static_features)

    def generate(self, params=None, past_values=None, past_time_features=None,
                 future_time_features=None, past_observed_mask=None,
                 static_categorical_features=None, static_real_features=None,
                 prng_key=None, **kwargs) -> SampleTSPredictionOutput:
        """Single-shot sampling (reference AutoformerForPrediction.generate)."""
        params = params if params is not None else self.params
        if prng_key is None:
            prng_key = jax.random.key(0)
        cfg = self.config
        model = self.model
        outputs, _ = model(params["model"], past_values=past_values,
                           past_time_features=past_time_features,
                           past_observed_mask=past_observed_mask,
                           static_categorical_features=static_categorical_features,
                           static_real_features=static_real_features)
        n = cfg.num_parallel_samples
        rep = lambda x: jnp.repeat(x, n, axis=0)
        loc, scale = rep(outputs.loc), rep(outputs.scale)
        past = (rep(past_values) - loc) / scale
        static_feat = outputs.static_features
        time_features = jnp.concatenate([past_time_features, future_time_features],
                                        axis=1)
        expanded = jnp.broadcast_to(
            static_feat[:, None], (static_feat.shape[0], time_features.shape[1],
                                   static_feat.shape[-1]))
        features = rep(jnp.concatenate([expanded, time_features], axis=-1))
        enc_hidden = rep(outputs.encoder_last_hidden_state)

        lagged = model.get_lagged_subsequences(past, cfg.context_length)
        lagged = lagged.reshape(lagged.shape[0], lagged.shape[1], -1)
        seasonal, trend_part = series_decomp(lagged, cfg.moving_average)
        mean = jnp.broadcast_to(lagged.mean(axis=1, keepdims=True),
                                (lagged.shape[0], cfg.prediction_length,
                                 lagged.shape[2]))
        zeros = jnp.zeros((lagged.shape[0], cfg.prediction_length,
                           lagged.shape[2]), lagged.dtype)
        dec_feats = features[:, -cfg.prediction_length - cfg.label_length:]
        decoder_input = jnp.concatenate(
            [jnp.concatenate([seasonal[:, -cfg.label_length:], zeros], axis=1),
             dec_feats], axis=-1)
        trend_init = jnp.concatenate(
            [jnp.concatenate([trend_part[:, -cfg.label_length:], mean], axis=1),
             dec_feats], axis=-1)
        dec_hidden, trend = model.decoder(params["model"]["decoder"],
                                          decoder_input, trend_init, enc_hidden)
        distr_args = self.output_params(params, dec_hidden + trend)
        distr = self.output_distribution(distr_args, loc=loc, scale=scale)
        samples = distr.sample(prng_key)
        return SampleTSPredictionOutput(sequences=samples.reshape(
            (-1, n, cfg.prediction_length) + self.target_shape))
