"""SEW — Squeezed and Efficient Wav2Vec (reference
src/transformers/models/sew/modeling_sew.py).

Wav2Vec2 feature encoder, then a SQUEEZED transformer: the strided positional
conv and an average pool both downsample time by ``squeeze_factor`` and are
summed (:forward of SEWEncoder); after the (post-LN) layers, ``upsample``
expands channels back into time (Linear to hidden·sq then reshape) and pads
to the input length. The model applies LayerNorm directly on the conv
features and only projects when conv_dim[-1] != hidden."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.module import LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import BaseModelOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ..wav2vec2.configuration_wav2vec2 import Wav2Vec2Config
from ..wav2vec2.modeling_wav2vec2 import (
    Wav2Vec2EncoderLayer,
    Wav2Vec2FeatureEncoder,
    Wav2Vec2ForCTC,
    Wav2Vec2ForSequenceClassification,
    Wav2Vec2PositionalConvEmbedding,
)
from .configuration_sew import SEWConfig


class SEWPositionalConvEmbedding(Wav2Vec2PositionalConvEmbedding):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.stride = config.squeeze_factor


class SEWUpsampling(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.projection = Linear(config.hidden_size,
                                 config.hidden_size * config.squeeze_factor, True,
                                 dtype=dtype, param_dtype=param_dtype,
                                 kernel_init=normal_init(config.initializer_range))
        self.act = get_activation(config.feat_extract_activation)
        self.sq = config.squeeze_factor

    def __call__(self, params, hidden):
        h = self.act(self.projection(params["projection"], hidden))
        if self.sq > 1:
            b, s, d = h.shape
            h = h.reshape(b, s * self.sq, d // self.sq)
        return h


class SEWEncoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.sq = config.squeeze_factor
        self.pos_conv_embed = SEWPositionalConvEmbedding(config, **kw)
        self.layer_norm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.layers = [Wav2Vec2EncoderLayer(config, **kw)
                       for _ in range(config.num_hidden_layers)]
        self.upsample = SEWUpsampling(config, **kw)

    def __call__(self, params, hidden, attention_mask=None, output_hidden_states=False):
        b, n_in, c = hidden.shape
        if attention_mask is not None:
            hidden = hidden * attention_mask[..., None].astype(hidden.dtype)
            out_lengths = attention_mask.sum(-1) // self.sq
            kv_valid = None  # computed below at pooled length
        x = jnp.swapaxes(hidden, 1, 2)  # [B, C, T]
        pos = jnp.swapaxes(self.pos_conv_embed(params["pos_conv_embed"],
                                               jnp.swapaxes(x, 1, 2)), 1, 2)
        pooled = jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, 1, self.sq), (1, 1, self.sq), "VALID") / self.sq
        m = min(pos.shape[-1], pooled.shape[-1])
        h = jnp.swapaxes(pooled[..., :m] + pos[..., :m], 1, 2)  # [B, m, C]

        if attention_mask is not None:
            kv_valid = (jnp.arange(m)[None, :] < out_lengths[:, None]).astype(jnp.int32)
        else:
            kv_valid = jnp.ones((b, m), jnp.int32)
        attn_args = {"kv_valid": kv_valid, "is_causal": False}

        h = self.layer_norm(params["layer_norm"], h)
        all_hidden = [] if output_hidden_states else None
        for i, layer in enumerate(self.layers):
            if output_hidden_states:
                all_hidden.append(h)
            h = layer(params["layers"][str(i)], h, attn_args)
        if output_hidden_states:
            all_hidden.append(h)
        h = self.upsample(params["upsample"], h)
        if h.shape[1] < n_in:
            h = jnp.pad(h, ((0, 0), (0, n_in - h.shape[1]), (0, 0)))
        return h, all_hidden


class SEWModel(Module):
    def __init__(self, config: SEWConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.feature_extractor = Wav2Vec2FeatureEncoder(config, **kw)
        self.layer_norm = LayerNorm(config.conv_dim[-1], config.layer_norm_eps, **kw)
        self.project_features = config.conv_dim[-1] != config.hidden_size
        if self.project_features:
            self.feature_projection = Linear(
                config.conv_dim[-1], config.hidden_size, True, dtype=dtype,
                param_dtype=param_dtype, kernel_init=normal_init(config.initializer_range))
        self.encoder = SEWEncoder(config, **kw)
        if config.apply_spec_augment:
            self.masked_spec_embed_size = config.hidden_size

    def init(self, rng):
        params = super().init(rng)
        if getattr(self, "masked_spec_embed_size", None):
            params["masked_spec_embed"] = jax.random.uniform(
                rng, (self.masked_spec_embed_size,), self.param_dtype)
        return params

    def __call__(self, params, input_values, attention_mask=None,
                 output_hidden_states=False) -> BaseModelOutput:
        feats = self.feature_extractor(params["feature_extractor"],
                                       jnp.asarray(input_values, self.dtype))
        feats = jnp.swapaxes(feats, 1, 2)
        hidden = self.layer_norm(params["layer_norm"], feats)
        if self.project_features:
            hidden = self.feature_projection(params["feature_projection"], hidden)
        feat_mask = None
        if attention_mask is not None:
            from ..wav2vec2.modeling_wav2vec2 import feature_vector_attention_mask

            feat_mask = feature_vector_attention_mask(self.config, attention_mask,
                                                      feats.shape[1])
        hidden, all_hidden = self.encoder(params["encoder"], hidden, feat_mask,
                                          output_hidden_states)
        return BaseModelOutput(
            last_hidden_state=hidden,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None)


class SEWPreTrainedModel(PreTrainedModel):
    config_class = SEWConfig
    base_model_prefix = "sew"


class SEWModelStandalone(SEWPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.sew = SEWModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, input_values=None, **kwargs):
        return self.sew(params["sew"], input_values, **kwargs)


class SEWForCTC(SEWPreTrainedModel, Wav2Vec2ForCTC):
    base_attr = "sew"
    model_cls = SEWModel

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        Wav2Vec2ForCTC.__init__(self, config, dtype=dtype, param_dtype=param_dtype)


class SEWForSequenceClassification(SEWPreTrainedModel, Wav2Vec2ForSequenceClassification):
    base_attr = "sew"
    model_cls = SEWModel

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        Wav2Vec2ForSequenceClassification.__init__(self, config, dtype=dtype,
                                                   param_dtype=param_dtype)
