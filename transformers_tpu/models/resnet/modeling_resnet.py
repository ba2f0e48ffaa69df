"""ResNet, TPU-native.

Semantics match reference src/transformers/models/resnet/modeling_resnet.py:
conv7x7 stem + maxpool (:72-93), basic/bottleneck residual stages (:113-217),
BatchNorm in INFERENCE form over running stats (core BatchNorm — the frozen-BN
semantics DETR fine-tuning uses), adaptive-avg-pool + Sequential classifier
(names ``classifier.1``), and a BackboneMixin exposing per-stage feature maps
(:392) for detection heads. Convs run through one lax.conv each (NCHW torch
layout kept; XLA picks the physical layout).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...core.module import BatchNorm, Conv, Linear, Module, normal_init
from dataclasses import dataclass

from ...modeling_outputs import BaseModelOutputWithPooling, ImageClassifierOutput
from ...utils.generic import ModelOutput


@dataclass
class BackboneOutput(ModelOutput):
    feature_maps: tuple = None
    hidden_states: tuple = None
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from .configuration_resnet import ResNetConfig


class ResNetConvLayer(Module):
    def __init__(self, in_ch, out_ch, kernel_size=3, stride=1, activation="relu", *,
                 dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.convolution = Conv(in_ch, out_ch, kernel_size, stride=stride,
                                padding=kernel_size // 2, use_bias=False, ndim=2,
                                dtype=dtype, param_dtype=param_dtype)
        self.normalization = BatchNorm(out_ch, dtype=dtype, param_dtype=param_dtype)
        self.act = get_activation(activation) if activation else None

    def __call__(self, params, x):
        x = self.normalization(params["normalization"],
                               self.convolution(params["convolution"], x))
        return self.act(x) if self.act else x


class ResNetShortCut(Module):
    def __init__(self, in_ch, out_ch, stride=2, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.convolution = Conv(in_ch, out_ch, 1, stride=stride, padding=0,
                                use_bias=False, ndim=2, dtype=dtype, param_dtype=param_dtype)
        self.normalization = BatchNorm(out_ch, dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, x):
        return self.normalization(params["normalization"],
                                  self.convolution(params["convolution"], x))


def _seq(children, *, dtype, param_dtype):
    container = Module(dtype=dtype, param_dtype=param_dtype)
    for i, child in enumerate(children):
        container._children[str(i)] = child
    return container


class ResNetResidualLayer(Module):
    """basic (2 convs) or bottleneck (1x1 -> 3x3 -> 1x1) + shortcut."""

    def __init__(self, config, in_ch, out_ch, stride=1, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        act = config.hidden_act
        self.has_shortcut = in_ch != out_ch or stride != 1
        if self.has_shortcut:
            self.shortcut = ResNetShortCut(in_ch, out_ch, stride=stride, **kw)
        if config.layer_type == "bottleneck":
            red = out_ch // 4
            dib = config.downsample_in_bottleneck
            convs = [
                ResNetConvLayer(in_ch, red, 1, stride if dib else 1, act, **kw),
                ResNetConvLayer(red, red, 3, stride if not dib else 1, act, **kw),
                ResNetConvLayer(red, out_ch, 1, 1, None, **kw),
            ]
        else:
            convs = [
                ResNetConvLayer(in_ch, out_ch, 3, stride, act, **kw),
                ResNetConvLayer(out_ch, out_ch, 3, 1, None, **kw),
            ]
        self.layer = _seq(convs, **kw)
        self.act = get_activation(act)

    def __call__(self, params, x):
        residual = x
        h = x
        for i, conv in self.layer._children.items():
            h = conv(params["layer"][i], h)
        if self.has_shortcut:
            residual = self.shortcut(params["shortcut"], residual)
        return self.act(h + residual)


class ResNetStage(Module):
    def __init__(self, config, in_ch, out_ch, stride=2, depth=2, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        layers = [ResNetResidualLayer(config, in_ch, out_ch, stride=stride, **kw)]
        layers += [ResNetResidualLayer(config, out_ch, out_ch, stride=1, **kw)
                   for _ in range(depth - 1)]
        self.layers = _seq(layers, **kw)

    def __call__(self, params, x):
        for i, layer in self.layers._children.items():
            x = layer(params["layers"][i], x)
        return x


class ResNetEmbeddings(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.embedder = ResNetConvLayer(config.num_channels, config.embedding_size,
                                        7, 2, config.hidden_act, dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, pixel_values):
        x = self.embedder(params["embedder"], pixel_values)
        # max-pool 3x3 stride 2 pad 1 (reference nn.MaxPool2d)
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
            [(0, 0), (0, 0), (1, 1), (1, 1)])


class ResNetEncoder(Module):
    def __init__(self, config: ResNetConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        stages = [ResNetStage(config, config.embedding_size, config.hidden_sizes[0],
                              stride=2 if config.downsample_in_first_stage else 1,
                              depth=config.depths[0], **kw)]
        for (in_ch, out_ch), depth in zip(zip(config.hidden_sizes, config.hidden_sizes[1:]),
                                          config.depths[1:]):
            stages.append(ResNetStage(config, in_ch, out_ch, depth=depth, **kw))
        self.stages = stages

    def __call__(self, params, x, collect_hidden=False):
        hidden_states = [x]
        for i, stage in enumerate(self.stages):
            x = stage(params["stages"][str(i)], x)
            hidden_states.append(x)
        return x, hidden_states


class ResNetPreTrainedModel(PreTrainedModel):
    config_class = ResNetConfig
    base_model_prefix = "resnet"
    main_input_name = "pixel_values"
    _keys_to_ignore_on_load_unexpected = (r"num_batches_tracked",)


class ResNetModel(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embedder = ResNetEmbeddings(config, **kw)
        self.encoder = ResNetEncoder(config, **kw)

    def __call__(self, params, pixel_values, output_hidden_states=False):
        x = self.embedder(params["embedder"], jnp.asarray(pixel_values, self.dtype))
        last, hidden_states = self.encoder(params["encoder"], x)
        pooled = jnp.mean(last, axis=(2, 3), keepdims=True)  # adaptive avg pool (1,1)
        return BaseModelOutputWithPooling(
            last_hidden_state=last, pooler_output=pooled,
            hidden_states=tuple(hidden_states) if output_hidden_states else None)


class ResNetModelStandalone(ResNetPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.resnet = ResNetModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, pixel_values=None, **kwargs):
        return self.resnet(params["resnet"], pixel_values, **kwargs)


class ResNetForImageClassification(ResNetPreTrainedModel):
    """avg-pool -> flatten -> Linear (Sequential name ``classifier.1``)."""

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.resnet = ResNetModel(config, **kw)
        classifier = Module(**kw)
        classifier._children["1"] = Linear(config.hidden_sizes[-1], config.num_labels, True,
                                           **kw, kernel_init=normal_init(0.02))
        self.classifier = classifier
        self.num_labels = config.num_labels

    def __call__(self, params, pixel_values=None, labels=None, **kwargs) -> ImageClassifierOutput:
        out = self.resnet(params["resnet"], pixel_values)
        pooled = out.pooler_output[:, :, 0, 0]
        logits = self.classifier._children["1"](params["classifier"]["1"], pooled)
        loss = None
        if labels is not None:
            from ...loss import for_sequence_classification_loss

            loss = for_sequence_classification_loss(logits, labels, self.config)
        return ImageClassifierOutput(loss=loss, logits=logits)


class ResNetBackbone(ResNetPreTrainedModel):
    """BackboneMixin analog (reference :392): returns the feature maps of the
    stages named in ``config.out_features``."""

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.resnet = ResNetModel(config, dtype=self.dtype, param_dtype=self.param_dtype)
        self.stage_names = config.stage_names
        self.out_features = config.out_features
        sizes = [config.embedding_size] + list(config.hidden_sizes)
        self.channels = [sizes[self.stage_names.index(name)] for name in self.out_features]

    def __call__(self, params, pixel_values=None, **kwargs):
        x = self.resnet.embedder(params["resnet"]["embedder"],
                                 jnp.asarray(pixel_values, self.dtype))
        _, hidden_states = self.resnet.encoder(params["resnet"]["encoder"], x)
        feature_maps = tuple(
            hidden_states[self.stage_names.index(name)] for name in self.out_features)
        return BackboneOutput(feature_maps=feature_maps)
