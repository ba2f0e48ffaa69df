"""PoolFormer (MetaFormer), TPU-native (reference
src/transformers/models/poolformer/modeling_poolformer.py).

Token mixing is just average pooling minus identity; per-stage overlapping
patch embeddings, 1-group GroupNorms, 1x1-conv MLPs, LayerScale.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.module import Conv, Linear, Module, normal_init
from ...modeling_outputs import SequenceClassifierOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...utils.generic import ModelOutput
from .configuration_poolformer import PoolFormerConfig
from dataclasses import dataclass
from typing import Any


@dataclass
class PoolFormerModelOutput(ModelOutput):
    last_hidden_state: Any = None
    hidden_states: Any = None


class PoolFormerGroupNorm(Module):
    """GroupNorm(1, C) over [B, C, H, W]."""

    def __init__(self, channels, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.channels = channels

    def init(self, rng):
        return {"weight": jnp.ones((self.channels,), self.param_dtype),
                "bias": jnp.zeros((self.channels,), self.param_dtype)}

    def __call__(self, params, x):
        h = x.astype(jnp.float32)
        mean = h.mean(axis=(1, 2, 3), keepdims=True)
        var = h.var(axis=(1, 2, 3), keepdims=True)
        h = (h - mean) / jnp.sqrt(var + 1e-5)
        w = params["weight"].astype(jnp.float32)[None, :, None, None]
        b = params["bias"].astype(jnp.float32)[None, :, None, None]
        return (h * w + b).astype(x.dtype)


def avg_pool_exclude_pad(x, pool_size):
    """AvgPool2d(pool, stride=1, pad=pool//2, count_include_pad=False)."""
    pad = pool_size // 2
    window = (1, 1, pool_size, pool_size)
    pads = [(0, 0), (0, 0), (pad, pad), (pad, pad)]
    sums = jax.lax.reduce_window(x, 0.0, jax.lax.add, window, (1, 1, 1, 1), pads)
    counts = jax.lax.reduce_window(jnp.ones_like(x), 0.0, jax.lax.add, window,
                                   (1, 1, 1, 1), pads)
    return sums / counts


class PoolFormerLayer(Module):
    def __init__(self, config, channels, inter, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.pool_size = config.pool_size
        self.before_norm = PoolFormerGroupNorm(channels, **kw)
        self.after_norm = PoolFormerGroupNorm(channels, **kw)
        self.output = _ConvMLP(config, channels, inter, **kw)
        self.use_layer_scale = config.use_layer_scale
        self.channels = channels
        self.scale_init = config.layer_scale_init_value

    def init(self, rng):
        params = super().init(rng)
        if self.use_layer_scale:
            params["layer_scale_1"] = jnp.full((self.channels,), self.scale_init,
                                               self.param_dtype)
            params["layer_scale_2"] = jnp.full((self.channels,), self.scale_init,
                                               self.param_dtype)
        return params

    def __call__(self, params, x):
        pooled = avg_pool_exclude_pad(
            self.before_norm(params["before_norm"], x), self.pool_size) \
            - self.before_norm(params["before_norm"], x)
        if self.use_layer_scale:
            pooled = params["layer_scale_1"].astype(x.dtype)[None, :, None, None] * pooled
        x = x + pooled
        mlp = self.output(params["output"], self.after_norm(params["after_norm"], x))
        if self.use_layer_scale:
            mlp = params["layer_scale_2"].astype(x.dtype)[None, :, None, None] * mlp
        return x + mlp


class _ConvMLP(Module):
    def __init__(self, config, channels, inter, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.conv1 = Conv(channels, inter, 1, ndim=2, **kw)
        self.conv2 = Conv(inter, channels, 1, ndim=2, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, x):
        return self.conv2(params["conv2"], self.act(self.conv1(params["conv1"], x)))


class PoolFormerEncoder(Module):
    def __init__(self, config: PoolFormerConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        embeddings = []
        blocks = []
        for i in range(config.num_encoder_blocks):
            cin = config.num_channels if i == 0 else config.hidden_sizes[i - 1]
            embeddings.append(_PatchEmbed(cin, config.hidden_sizes[i],
                                          config.patch_sizes[i], config.strides[i],
                                          config.padding[i], **kw))
            layers = [PoolFormerLayer(config, config.hidden_sizes[i],
                                      int(config.hidden_sizes[i] * config.mlp_ratio),
                                      **kw)
                      for _ in range(config.depths[i])]
            blocks.append(_Stage(layers, **kw))
        self.patch_embeddings = embeddings
        self.block = blocks

    def __call__(self, params, x, output_hidden_states=False):
        all_hidden = [] if output_hidden_states else None
        for i, (emb, stage) in enumerate(zip(self.patch_embeddings, self.block)):
            x = emb(params["patch_embeddings"][str(i)], x)
            for j, layer in enumerate(stage.layers):
                x = layer(params["block"][str(i)][str(j)], x)
            if output_hidden_states:
                all_hidden.append(x)
        return x, all_hidden


class _PatchEmbed(Module):
    def __init__(self, cin, cout, patch, stride, padding, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.projection = Conv(cin, cout, patch, stride=stride, padding=padding,
                               ndim=2, dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, x):
        return self.projection(params["projection"], x)


class _Stage(Module):
    def __init__(self, layers, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.layers = layers

    def init(self, rng):
        keys = jax.random.split(rng, len(self.layers))
        return {str(i): m.init(k) for i, (m, k) in enumerate(zip(self.layers, keys))}


class PoolFormerModel(Module):
    def __init__(self, config: PoolFormerConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.encoder = PoolFormerEncoder(config, dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, pixel_values, output_hidden_states=False, **kwargs):
        x, all_hidden = self.encoder(params["encoder"],
                                     jnp.asarray(pixel_values, self.dtype),
                                     output_hidden_states)
        return PoolFormerModelOutput(
            last_hidden_state=x,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None)


class PoolFormerPreTrainedModel(PreTrainedModel):
    config_class = PoolFormerConfig
    base_model_prefix = "poolformer"
    main_input_name = "pixel_values"


class PoolFormerModelStandalone(PoolFormerPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.poolformer = PoolFormerModel(config, dtype=self.dtype,
                                          param_dtype=self.param_dtype)

    def __call__(self, params, pixel_values=None, **kwargs):
        return self.poolformer(params["poolformer"], pixel_values, **kwargs)


class PoolFormerForImageClassification(PoolFormerPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.poolformer = PoolFormerModel(config, **kw)
        self.norm = PoolFormerGroupNorm(config.hidden_sizes[-1], **kw)
        if config.num_labels > 0:
            self.classifier = Linear(config.hidden_sizes[-1], config.num_labels,
                                     True,
                                     kernel_init=normal_init(config.initializer_range),
                                     **kw)

    def __call__(self, params, pixel_values=None, labels=None, **kwargs):
        out = self.poolformer(params["poolformer"], pixel_values)
        h = self.norm(params["norm"], out.last_hidden_state).mean(axis=(2, 3))
        logits = self.classifier(params["classifier"], h)
        loss = None
        if labels is not None:
            from ...loss import for_sequence_classification_loss

            loss = for_sequence_classification_loss(logits, labels, self.config)
        return SequenceClassifierOutput(loss=loss, logits=logits)
