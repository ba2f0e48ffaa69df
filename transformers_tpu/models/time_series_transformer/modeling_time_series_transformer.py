"""TimeSeriesTransformer, TPU-native (reference
src/transformers/models/time_series_transformer/modeling_time_series_transformer.py).

Probabilistic forecasting: lagged subsequences + time/static covariates →
value projection → vanilla BART-style encoder-decoder (post-LN, frozen
XLM-layout sinusoid positions) → distribution head (Student-T / Normal /
Negative-Binomial).  `generate` draws `num_parallel_samples` trajectories
by batched ancestral sampling — the sample axis is folded into the batch
axis, so every decode step stays one big MXU matmul.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ...core.module import Embedding, LayerNorm, Linear, Module, normal_init
from ...modeling_utils import PreTrainedModel
from ...time_series_utils import get_distribution_output, weighted_average
from ...utils.generic import ModelOutput
from ..bart.modeling_bart import BartDecoderLayer, BartEncoderLayer
from ..pegasus.modeling_pegasus import PegasusSinusoidalPositionalEmbedding
from .configuration_time_series_transformer import TimeSeriesTransformerConfig


@dataclass
class Seq2SeqTSModelOutput(ModelOutput):
    last_hidden_state: Any = None
    encoder_last_hidden_state: Any = None
    loc: Any = None
    scale: Any = None
    static_features: Any = None


@dataclass
class Seq2SeqTSPredictionOutput(ModelOutput):
    loss: Any = None
    params: Any = None
    encoder_last_hidden_state: Any = None
    loc: Any = None
    scale: Any = None
    static_features: Any = None


@dataclass
class SampleTSPredictionOutput(ModelOutput):
    sequences: Any = None


# -------------------------------------------------------------------- scalers
def std_scaler(data, observed, minimum_scale=1e-5):
    """(reference TimeSeriesStdScaler)."""
    denom = jnp.clip(observed.sum(1, keepdims=True), 1.0, None)
    loc = (data * observed).sum(1, keepdims=True) / denom
    variance = (jnp.square((data - loc) * observed)).sum(1, keepdims=True) / denom
    scale = jnp.sqrt(variance + minimum_scale)
    return (data - loc) / scale, loc, scale


def mean_scaler(data, observed, minimum_scale=1e-10, default_scale=None):
    """(reference TimeSeriesMeanScaler)."""
    ts_sum = jnp.abs(data * observed).sum(1, keepdims=True)
    num_observed = observed.sum(1, keepdims=True)
    scale = ts_sum / jnp.clip(num_observed, 1.0, None)
    if default_scale is None:
        batch_sum = ts_sum.sum(0)
        batch_obs = jnp.clip(num_observed.sum(0), 1.0, None)
        default = jnp.squeeze(batch_sum / batch_obs)
    else:
        default = default_scale * jnp.ones_like(scale)
    scale = jnp.where(num_observed > 0, scale, default)
    scale = jnp.clip(scale, minimum_scale, None)
    return data / scale, jnp.zeros_like(scale), scale


def nop_scaler(data, observed):
    return data, jnp.zeros_like(data).mean(1, keepdims=True), \
        jnp.ones_like(data).mean(1, keepdims=True)


class TimeSeriesFeatureEmbedder(Module):
    """Concatenated per-feature categorical embeddings (reference
    TimeSeriesFeatureEmbedder)."""

    def __init__(self, cardinalities, embedding_dims, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.embedders = [Embedding(c, d, dtype=dtype, param_dtype=param_dtype,
                                    embedding_init=normal_init(0.02))
                          for c, d in zip(cardinalities, embedding_dims)]

    def __call__(self, params, features):
        outs = []
        for i, emb in enumerate(self.embedders):
            outs.append(emb(params["embedders"][str(i)], features[..., i]))
        return jnp.concatenate(outs, axis=-1)


class _TSEncoder(Module):
    layer_cls = BartEncoderLayer

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.value_embedding = _ValueEmbedding(config, **kw)
        self.embed_positions = PegasusSinusoidalPositionalEmbedding(
            config.context_length + config.prediction_length, config.d_model, **kw)
        self.layers = [self.layer_cls(config, **kw) for _ in range(config.encoder_layers)]
        self.layernorm_embedding = LayerNorm(config.d_model, 1e-5, **kw)

    def __call__(self, params, inputs_embeds, attention_mask=None):
        b, s, _ = inputs_embeds.shape
        h = self.value_embedding(params["value_embedding"], inputs_embeds)
        pos = self.embed_positions(params["embed_positions"],
                                   jnp.arange(s, dtype=jnp.int32))
        h = self.layernorm_embedding(params["layernorm_embedding"], h + pos[None])
        kv_valid = (attention_mask if attention_mask is not None
                    else jnp.ones((b, s), jnp.int32))
        attn_args = {"kv_valid": kv_valid, "is_causal": False}
        for i, layer in enumerate(self.layers):
            h = layer(params["layers"][str(i)], h, attn_args)
        return h


class _ValueEmbedding(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.value_projection = Linear(config.feature_size, config.d_model, False,
                                       dtype=dtype, param_dtype=param_dtype,
                                       kernel_init=normal_init(config.init_std))

    def __call__(self, params, x):
        return self.value_projection(params["value_projection"], x)


class _TSDecoder(Module):
    layer_cls = BartDecoderLayer

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.value_embedding = _ValueEmbedding(config, **kw)
        self.embed_positions = PegasusSinusoidalPositionalEmbedding(
            config.context_length + config.prediction_length, config.d_model, **kw)
        self.layers = [self.layer_cls(config, **kw) for _ in range(config.decoder_layers)]
        self.layernorm_embedding = LayerNorm(config.d_model, 1e-5, **kw)

    def __call__(self, params, inputs_embeds, encoder_hidden, encoder_mask=None):
        b, s, _ = inputs_embeds.shape
        h = self.value_embedding(params["value_embedding"], inputs_embeds)
        # decoder positions start at context_length (reference passes
        # past_key_values_length=config.context_length)
        pos = self.embed_positions(
            params["embed_positions"],
            jnp.arange(s, dtype=jnp.int32) + self.config.context_length)
        h = self.layernorm_embedding(params["layernorm_embedding"], h + pos[None])
        positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))
        attn_args = {"q_positions": positions,
                     "kv_valid": jnp.ones((b, s), jnp.int32), "is_causal": True}
        cross_args = {"is_causal": False}
        if encoder_mask is not None:
            cross_args["kv_valid"] = encoder_mask
        for i, layer in enumerate(self.layers):
            cross_kv = layer.encoder_attn.kv(
                params["layers"][str(i)]["encoder_attn"], encoder_hidden)
            h, _ = layer(params["layers"][str(i)], h, attn_args, cross_args,
                         cross_kv, None, i, 0)
        return h


class TimeSeriesTransformerModel(Module):
    encoder_cls = _TSEncoder
    decoder_cls = _TSDecoder

    def __init__(self, config: TimeSeriesTransformerConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        if config.num_static_categorical_features > 0:
            self.embedder = TimeSeriesFeatureEmbedder(
                config.cardinality, config.embedding_dimension, **kw)
        self.encoder = self.encoder_cls(config, **kw)
        self.decoder = self.decoder_cls(config, **kw)

    @property
    def _past_length(self):
        return self.config.context_length + max(self.config.lags_sequence)

    def scale(self, context, observed):
        if self.config.scaling == "mean" or self.config.scaling is True:
            return mean_scaler(context, observed)
        if self.config.scaling == "std":
            return std_scaler(context, observed)
        return nop_scaler(context, observed)

    def get_lagged_subsequences(self, sequence, subsequences_length, shift=0):
        """[b, S, C, num_lags] (reference get_lagged_subsequences)."""
        seq_len = sequence.shape[1]
        lagged = []
        for lag in self.config.lags_sequence:
            idx = lag - shift
            begin = seq_len - idx - subsequences_length
            lagged.append(jax.lax.dynamic_slice_in_dim(
                sequence, begin, subsequences_length, 1))
        return jnp.stack(lagged, axis=-1)

    def create_network_inputs(self, params, past_values, past_time_features,
                              static_categorical_features=None,
                              static_real_features=None, past_observed_mask=None,
                              future_values=None, future_time_features=None):
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
        sq_loc = loc.squeeze(1) if loc.ndim == 3 else loc
        sq_scale = scale.squeeze(1) if scale.ndim == 3 else scale
        static_feat = jnp.concatenate([jnp.log1p(jnp.abs(sq_loc)),
                                       jnp.log(sq_scale)], axis=1)
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
        transformer_inputs = jnp.concatenate([lagged, features], axis=-1)
        return transformer_inputs, loc, scale, static_feat

    def __call__(self, params, past_values=None, past_time_features=None,
                 past_observed_mask=None, static_categorical_features=None,
                 static_real_features=None, future_values=None,
                 future_time_features=None, **kwargs) -> Seq2SeqTSModelOutput:
        cfg = self.config
        transformer_inputs, loc, scale, static_feat = self.create_network_inputs(
            params, past_values, past_time_features, static_categorical_features,
            static_real_features, past_observed_mask, future_values,
            future_time_features)
        enc_input = transformer_inputs[:, :cfg.context_length]
        enc_hidden = self.encoder(params["encoder"], enc_input)
        if cfg.context_length >= transformer_inputs.shape[1]:
            dec_input = jnp.zeros(
                (transformer_inputs.shape[0], 1, transformer_inputs.shape[2]),
                transformer_inputs.dtype)
        else:
            dec_input = transformer_inputs[:, cfg.context_length:]
        dec_hidden = self.decoder(params["decoder"], dec_input, enc_hidden)
        return Seq2SeqTSModelOutput(last_hidden_state=dec_hidden,
                                    encoder_last_hidden_state=enc_hidden,
                                    loc=loc, scale=scale, static_features=static_feat)


class TimeSeriesTransformerPreTrainedModel(PreTrainedModel):
    config_class = TimeSeriesTransformerConfig
    base_model_prefix = "model"


class TimeSeriesTransformerModelStandalone(TimeSeriesTransformerPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.model = TimeSeriesTransformerModel(config, dtype=self.dtype,
                                                param_dtype=self.param_dtype)

    def __call__(self, params, **kwargs):
        return self.model(params["model"], **kwargs)


class TimeSeriesTransformerForPrediction(TimeSeriesTransformerPreTrainedModel):
    """Distribution head + NLL loss + sampling forecast (reference
    TimeSeriesTransformerForPrediction)."""

    model_cls = TimeSeriesTransformerModel

    def __init__(self, config: TimeSeriesTransformerConfig, *, dtype=jnp.float32,
                 param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.model = self.model_cls(config, **kw)
        self.distribution_output = get_distribution_output(
            config.distribution_output, config.input_size)
        self.parameter_projection = self.distribution_output.get_parameter_projection(
            config.d_model, **kw)
        self.target_shape = self.distribution_output.event_shape

    def output_params(self, params, dec_output):
        raw = self.parameter_projection(params["parameter_projection"], dec_output)
        return self.distribution_output.domain_map(*raw)

    def output_distribution(self, distr_args, loc=None, scale=None, trailing_n=None):
        if trailing_n is not None:
            distr_args = tuple(p[:, -trailing_n:] for p in distr_args)
        return self.distribution_output.distribution(distr_args, loc=loc, scale=scale)

    def __call__(self, params, past_values=None, past_time_features=None,
                 past_observed_mask=None, static_categorical_features=None,
                 static_real_features=None, future_values=None,
                 future_time_features=None, future_observed_mask=None,
                 **kwargs) -> Seq2SeqTSPredictionOutput:
        outputs = self.model(params["model"], past_values=past_values,
                             past_time_features=past_time_features,
                             past_observed_mask=past_observed_mask,
                             static_categorical_features=static_categorical_features,
                             static_real_features=static_real_features,
                             future_values=future_values,
                             future_time_features=future_time_features)
        loss = None
        distr_args = None
        if future_values is not None:
            distr_args = self.output_params(params, outputs.last_hidden_state)
            distr = self.output_distribution(distr_args, loc=outputs.loc,
                                             scale=outputs.scale)
            nll = -distr.log_prob(future_values)
            if future_observed_mask is None:
                future_observed_mask = jnp.ones_like(future_values)
            if len(self.target_shape) == 0:
                loss_weights = future_observed_mask
            else:
                loss_weights = future_observed_mask.min(axis=-1)
            loss = weighted_average(nll, weights=loss_weights)
        return Seq2SeqTSPredictionOutput(
            loss=loss, params=distr_args,
            encoder_last_hidden_state=outputs.encoder_last_hidden_state,
            loc=outputs.loc, scale=outputs.scale,
            static_features=outputs.static_features)

    def generate(self, params=None, past_values=None, past_time_features=None,
                 future_time_features=None, past_observed_mask=None,
                 static_categorical_features=None, static_real_features=None,
                 prng_key=None, **kwargs) -> SampleTSPredictionOutput:
        """Ancestral sampling of num_parallel_samples trajectories
        (reference TimeSeriesTransformerForPrediction.generate)."""
        params = params if params is not None else self.params
        if prng_key is None:
            prng_key = jax.random.key(0)
        cfg = self.config
        model = self.model
        outputs = self.model(params["model"], past_values=past_values,
                             past_time_features=past_time_features,
                             past_observed_mask=past_observed_mask,
                             static_categorical_features=static_categorical_features,
                             static_real_features=static_real_features)
        n = cfg.num_parallel_samples
        rep = lambda x: jnp.repeat(x, n, axis=0)
        loc, scale = rep(outputs.loc), rep(outputs.scale)
        past = (rep(past_values) - loc) / scale
        static_feat = outputs.static_features
        expanded = jnp.broadcast_to(
            static_feat[:, None], (static_feat.shape[0],
                                   future_time_features.shape[1],
                                   static_feat.shape[-1]))
        features = rep(jnp.concatenate([expanded, future_time_features], axis=-1))
        enc_hidden = rep(outputs.encoder_last_hidden_state)

        samples = []
        key = prng_key
        for k in range(cfg.prediction_length):
            lagged = model.get_lagged_subsequences(past, 1 + k, shift=1)
            lagged = lagged.reshape(lagged.shape[0], lagged.shape[1], -1)
            dec_input = jnp.concatenate([lagged, features[:, :k + 1]], axis=-1)
            dec_hidden = model.decoder(params["model"]["decoder"], dec_input,
                                       enc_hidden)
            raw = self.parameter_projection(params["parameter_projection"],
                                            dec_hidden[:, -1:])
            distr_args = self.distribution_output.domain_map(*raw)
            distr = self.output_distribution(distr_args, loc=loc, scale=scale)
            key, sub = jax.random.split(key)
            next_sample = distr.sample(sub)
            past = jnp.concatenate([past, (next_sample - loc) / scale], axis=1)
            samples.append(next_sample)
        seqs = jnp.concatenate(samples, axis=1)
        return SampleTSPredictionOutput(sequences=seqs.reshape(
            (-1, n, cfg.prediction_length) + self.target_shape))
