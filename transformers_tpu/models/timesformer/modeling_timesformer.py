"""TimeSformer (reference models/timesformer/modeling_timesformer.py):
video ViT with divided space-time attention — each layer runs temporal
attention over frames per-patch (:332), then spatial attention per-frame
with a broadcast CLS (:352), averaging the CLS over frames (:377)."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ...configuration_utils import PretrainedConfig
from ...core.module import Embedding, LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import BaseModelOutput, ImageClassifierOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation


class TimesformerConfig(PretrainedConfig):
    model_type = "timesformer"

    def __init__(self, image_size=224, patch_size=16, num_channels=3,
                 num_frames=8, hidden_size=768, num_hidden_layers=12,
                 num_attention_heads=12, intermediate_size=3072,
                 hidden_act="gelu", hidden_dropout_prob=0.0,
                 attention_probs_dropout_prob=0.0, initializer_range=0.02,
                 layer_norm_eps=1e-6, qkv_bias=True,
                 attention_type="divided_space_time", drop_path_rate=0,
                 **kwargs):
        self.image_size = image_size
        self.patch_size = patch_size
        self.num_channels = num_channels
        self.num_frames = num_frames
        self.hidden_size = hidden_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.intermediate_size = intermediate_size
        self.hidden_act = hidden_act
        self.hidden_dropout_prob = hidden_dropout_prob
        self.attention_probs_dropout_prob = attention_probs_dropout_prob
        self.initializer_range = initializer_range
        self.layer_norm_eps = layer_norm_eps
        self.qkv_bias = qkv_bias
        self.attention_type = attention_type
        self.drop_path_rate = drop_path_rate
        super().__init__(**kwargs)


class TimesformerAttention(Module):
    """Fused-qkv self attention; output proj lives at ``output.dense``."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.num_heads = config.num_attention_heads
        self.head_dim = config.hidden_size // config.num_attention_heads
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        attention = Module(dtype=dtype, param_dtype=param_dtype)
        attention.qkv = Linear(config.hidden_size, 3 * config.hidden_size,
                               config.qkv_bias, **kw)
        self.attention = attention
        output = Module(dtype=dtype, param_dtype=param_dtype)
        output.dense = Linear(config.hidden_size, config.hidden_size, True, **kw)
        self.output = output

    def __call__(self, params, hidden):
        b, s, e = hidden.shape
        qkv = self.attention.qkv(params["attention"]["qkv"], hidden)
        qkv = qkv.reshape(b, s, 3, self.num_heads, self.head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        w = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(self.head_dim)
        probs = jax.nn.softmax(w, axis=-1)
        c = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, e)
        return self.output.dense(params["output"]["dense"], c)


class TimesformerLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        kw2 = dict(dtype=dtype, param_dtype=param_dtype,
                   kernel_init=normal_init(config.initializer_range))
        self.attention = TimesformerAttention(config, **kw)
        inter = Module(**kw)
        inter.dense = Linear(config.hidden_size, config.intermediate_size, True, **kw2)
        self.intermediate = inter
        out = Module(**kw)
        out.dense = Linear(config.intermediate_size, config.hidden_size, True, **kw2)
        self.output = out
        self.layernorm_before = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.layernorm_after = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.act = get_activation(config.hidden_act)
        if config.attention_type == "divided_space_time":
            self.temporal_layernorm = LayerNorm(config.hidden_size,
                                                config.layer_norm_eps, **kw)
            self.temporal_attention = TimesformerAttention(config, **kw)
            self.temporal_dense = Linear(config.hidden_size, config.hidden_size,
                                         True, **kw2)

    def _mlp(self, params, hidden):
        y = self.layernorm_after(params["layernorm_after"], hidden)
        y = self.act(self.intermediate.dense(params["intermediate"]["dense"], y))
        return hidden + self.output.dense(params["output"]["dense"], y)

    def __call__(self, params, hidden):
        c = self.config
        if c.attention_type != "divided_space_time":
            a = self.attention(params["attention"],
                               self.layernorm_before(params["layernorm_before"], hidden))
            return self._mlp(params, hidden + a)

        f = c.num_frames
        nw = c.image_size // c.patch_size
        b, s, e = hidden.shape
        nh = ((s - 1) // f) // nw
        p = nh * nw
        # temporal: per-patch attention over frames (token order is
        # patch-major, frame-minor)
        tokens = hidden[:, 1:].reshape(b * p, f, e)
        t = self.temporal_attention(
            params["temporal_attention"],
            self.temporal_layernorm(params["temporal_layernorm"], tokens))
        t = self.temporal_dense(params["temporal_dense"], t.reshape(b, p * f, e))
        temporal = hidden[:, 1:] + t
        # spatial: per-frame attention with a broadcast CLS token
        init_cls = hidden[:, 0:1]
        cls = jnp.broadcast_to(init_cls, (b, f, e)).reshape(b * f, 1, e)
        spatial = temporal.reshape(b, p, f, e).transpose(0, 2, 1, 3).reshape(b * f, p, e)
        spatial = jnp.concatenate([cls, spatial], axis=1)
        a = self.attention(params["attention"],
                           self.layernorm_before(params["layernorm_before"], spatial))
        cls_out = a[:, 0].reshape(b, f, e).mean(axis=1, keepdims=True)
        res = a[:, 1:].reshape(b, f, p, e).transpose(0, 2, 1, 3).reshape(b, p * f, e)
        hidden = (jnp.concatenate([init_cls, temporal], axis=1)
                  + jnp.concatenate([cls_out, res], axis=1))
        return self._mlp(params, hidden)


class TimesformerEmbeddings(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config

    def init(self, rng):
        c = self.config
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        init = normal_init(c.initializer_range)
        np_side = c.image_size // c.patch_size
        params = {
            "cls_token": init(k1, (1, 1, c.hidden_size), self.param_dtype),
            "position_embeddings": init(k2, (1, np_side * np_side + 1,
                                             c.hidden_size), self.param_dtype),
            "patch_embeddings": {"projection": {
                "weight": init(k3, (c.hidden_size, c.num_channels,
                                    c.patch_size, c.patch_size), self.param_dtype),
                "bias": jnp.zeros((c.hidden_size,), self.param_dtype)}},
        }
        if c.attention_type != "space_only":
            params["time_embeddings"] = init(
                k4, (1, c.num_frames, c.hidden_size), self.param_dtype)
        return params

    def __call__(self, params, pixel_values):  # [B, F, C, H, W]
        c = self.config
        ps = c.patch_size
        b, f, ch, hh, ww = pixel_values.shape
        x = pixel_values.reshape(b * f, ch, hh // ps, ps, ww // ps, ps)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(
            b * f, (hh // ps) * (ww // ps), ch * ps * ps)
        w = params["patch_embeddings"]["projection"]["weight"].astype(self.dtype)
        patches = (x.astype(self.dtype) @ w.reshape(w.shape[0], -1).T
                   + params["patch_embeddings"]["projection"]["bias"].astype(self.dtype))
        cls = jnp.broadcast_to(params["cls_token"].astype(self.dtype),
                               (b * f, 1, c.hidden_size))
        h = jnp.concatenate([cls, patches], axis=1)
        h = h + params["position_embeddings"].astype(self.dtype)
        if c.attention_type == "space_only":
            # [B*F, 1+P, E] flattened per-frame; model averages later
            return h
        p = h.shape[1] - 1
        e = c.hidden_size
        cls0 = h[:b, 0:1]  # CLS of the first frame per batch element
        tokens = h[:, 1:].reshape(b, f, p, e).transpose(0, 2, 1, 3).reshape(b * p, f, e)
        tokens = tokens + params["time_embeddings"].astype(self.dtype)
        tokens = tokens.reshape(b, p * f, e)
        return jnp.concatenate([cls0, tokens], axis=1)


class TimesformerPreTrainedModel(PreTrainedModel):
    config_class = TimesformerConfig
    base_model_prefix = "timesformer"
    main_input_name = "pixel_values"


class TimesformerModel(TimesformerPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.embeddings = TimesformerEmbeddings(config, **kw)
        encoder = Module(**kw)
        encoder.layer = [TimesformerLayer(config, **kw)
                         for _ in range(config.num_hidden_layers)]
        self.encoder = encoder
        self.layernorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)

    def __call__(self, params, pixel_values, output_hidden_states=False, **kwargs):
        h = self.embeddings(params["embeddings"], pixel_values)
        all_hidden = [] if output_hidden_states else None
        for i, layer in enumerate(self.encoder.layer):
            if output_hidden_states:
                all_hidden.append(h)
            h = layer(params["encoder"]["layer"][str(i)], h)
        if output_hidden_states:
            all_hidden.append(h)
        h = self.layernorm(params["layernorm"], h)
        return BaseModelOutput(
            last_hidden_state=h,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None)


class TimesformerForVideoClassification(TimesformerPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.timesformer = TimesformerModel(config, dtype=self.dtype,
                                            param_dtype=self.param_dtype)
        self.classifier = Linear(config.hidden_size, config.num_labels, True,
                                 dtype=self.dtype, param_dtype=self.param_dtype,
                                 kernel_init=normal_init(config.initializer_range))

    def __call__(self, params, pixel_values, labels=None,
                 output_hidden_states=False, **kwargs):
        outputs = self.timesformer(params["timesformer"], pixel_values,
                                   output_hidden_states)
        logits = self.classifier(params["classifier"],
                                 outputs.last_hidden_state[:, 0])
        loss = None
        if labels is not None:
            from ...loss import for_sequence_classification_loss

            loss = for_sequence_classification_loss(logits, labels, self.config)
        return ImageClassifierOutput(loss=loss, logits=logits,
                                     hidden_states=outputs.hidden_states)
