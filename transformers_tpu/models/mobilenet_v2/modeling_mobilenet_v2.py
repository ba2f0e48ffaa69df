"""MobileNetV2 (reference src/transformers/models/mobilenet_v2/modeling_mobilenet_v2.py).

Inverted-residual conv tower: stem (3x3 s2 + depthwise + 1x1 reduce), 16
expand→depthwise→reduce blocks with residuals when shapes match, final 1x1
expansion, global average pool. TensorFlow "SAME" padding semantics
(``tf_padding``) and relu6 activations; BatchNorm runs on stored stats."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ...core.module import BatchNorm, Conv, Linear, Module, normal_init
from ...modeling_outputs import SequenceClassifierOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...utils.generic import ModelOutput
from dataclasses import dataclass

from .configuration_mobilenet_v2 import MobileNetV2Config


@dataclass
class MobileNetV2ModelOutput(ModelOutput):
    last_hidden_state: Any = None
    pooler_output: Any = None
    hidden_states: Any = None


def make_divisible(value, divisor=8, min_value=None):
    if min_value is None:
        min_value = divisor
    new_value = max(min_value, int(value + divisor / 2) // divisor * divisor)
    if new_value < 0.9 * value:
        new_value += divisor
    return int(new_value)


def apply_depth_multiplier(config, channels):
    return make_divisible(int(round(channels * config.depth_multiplier)),
                          config.depth_divisible_by, config.min_depth)


def tf_same_pad(x, kernel, stride, dilation):
    h, w = x.shape[-2:]
    pad_h = max(kernel - stride, 0) if h % stride == 0 else max(kernel - h % stride, 0)
    pad_w = max(kernel - stride, 0) if w % stride == 0 else max(kernel - w % stride, 0)
    top = pad_h // 2
    left = pad_w // 2
    return jnp.pad(x, ((0, 0), (0, 0),
                       (top * dilation, (pad_h - top) * dilation),
                       (left * dilation, (pad_w - left) * dilation)))


class MobileNetV2ConvLayer(Module):
    def __init__(self, config, in_ch, out_ch, kernel_size, stride=1, groups=1,
                 dilation=1, use_activation=True, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.tf_padding = config.tf_padding
        self.kernel, self.stride, self.dilation = kernel_size, stride, dilation
        padding = 0 if config.tf_padding else ((kernel_size - 1) // 2) * dilation
        self.convolution = Conv(in_ch, out_ch, kernel_size, stride=stride,
                                padding=padding, use_bias=False, groups=groups,
                                dilation=dilation, ndim=2, dtype=dtype,
                                param_dtype=param_dtype)
        self.normalization = BatchNorm(out_ch, config.layer_norm_eps, dtype=dtype,
                                       param_dtype=param_dtype)
        self.act = get_activation(config.hidden_act) if use_activation else None

    def __call__(self, params, x):
        if self.tf_padding:
            x = tf_same_pad(x, self.kernel, self.stride, self.dilation)
        x = self.convolution(params["convolution"], x)
        x = self.normalization(params["normalization"], x)
        if self.act is not None:
            x = self.act(x)
        return x


class MobileNetV2Stem(Module):
    def __init__(self, config, in_ch, expanded, out_ch, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.first_conv = MobileNetV2ConvLayer(config, in_ch, expanded, 3, stride=2, **kw)
        if config.first_layer_is_expansion:
            self.expand_1x1 = None
        else:
            self.expand_1x1 = MobileNetV2ConvLayer(config, expanded, expanded, 1, **kw)
        self.conv_3x3 = MobileNetV2ConvLayer(config, expanded, expanded, 3,
                                             groups=expanded, **kw)
        self.reduce_1x1 = MobileNetV2ConvLayer(config, expanded, out_ch, 1,
                                               use_activation=False, **kw)

    def __call__(self, params, x):
        x = self.first_conv(params["first_conv"], x)
        if self.expand_1x1 is not None:
            x = self.expand_1x1(params["expand_1x1"], x)
        x = self.conv_3x3(params["conv_3x3"], x)
        return self.reduce_1x1(params["reduce_1x1"], x)


class MobileNetV2InvertedResidual(Module):
    def __init__(self, config, in_ch, out_ch, stride, dilation=1, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        expanded = make_divisible(int(round(in_ch * config.expand_ratio)),
                                  config.depth_divisible_by, config.min_depth)
        self.use_residual = stride == 1 and in_ch == out_ch
        self.expand_1x1 = MobileNetV2ConvLayer(config, in_ch, expanded, 1, **kw)
        self.conv_3x3 = MobileNetV2ConvLayer(config, expanded, expanded, 3,
                                             stride=stride, groups=expanded,
                                             dilation=dilation, **kw)
        self.reduce_1x1 = MobileNetV2ConvLayer(config, expanded, out_ch, 1,
                                               use_activation=False, **kw)

    def __call__(self, params, x):
        residual = x
        x = self.expand_1x1(params["expand_1x1"], x)
        x = self.conv_3x3(params["conv_3x3"], x)
        x = self.reduce_1x1(params["reduce_1x1"], x)
        return residual + x if self.use_residual else x


class MobileNetV2Model(Module):
    def __init__(self, config: MobileNetV2Config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        channels = [16, 24, 24, 32, 32, 32, 64, 64, 64, 64, 96, 96, 96, 160, 160, 160, 320]
        channels = [apply_depth_multiplier(config, c) for c in channels]
        strides = [2, 1, 2, 1, 1, 2, 1, 1, 1, 1, 1, 1, 2, 1, 1, 1]
        self.conv_stem = MobileNetV2Stem(config, config.num_channels,
                                         apply_depth_multiplier(config, 32),
                                         channels[0], **kw)
        layers = []
        current_stride, dilation = 2, 1
        for i in range(16):
            if current_stride == config.output_stride:
                layer_stride, layer_dilation = 1, dilation
                dilation *= strides[i]
            else:
                layer_stride, layer_dilation = strides[i], 1
                current_stride *= layer_stride
            layers.append(MobileNetV2InvertedResidual(
                config, channels[i], channels[i + 1], layer_stride, layer_dilation, **kw))
        self.layer = layers
        out_ch = (1280 if config.finegrained_output and config.depth_multiplier < 1.0
                  else apply_depth_multiplier(config, 1280))
        self.conv_1x1 = MobileNetV2ConvLayer(config, channels[-1], out_ch, 1, **kw)

    def __call__(self, params, pixel_values, output_hidden_states=False, **kwargs):
        x = self.conv_stem(params["conv_stem"], jnp.asarray(pixel_values, self.dtype))
        all_hidden = [] if output_hidden_states else None
        for i, layer in enumerate(self.layer):
            x = layer(params["layer"][str(i)], x)
            if output_hidden_states:
                all_hidden.append(x)
        last = self.conv_1x1(params["conv_1x1"], x)
        pooled = last.mean(axis=(2, 3))
        return MobileNetV2ModelOutput(
            last_hidden_state=last, pooler_output=pooled,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None)


class MobileNetV2PreTrainedModel(PreTrainedModel):
    config_class = MobileNetV2Config
    base_model_prefix = "mobilenet_v2"
    _keys_to_ignore_on_load_unexpected = (r"num_batches_tracked$",)


class MobileNetV2ModelStandalone(MobileNetV2PreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.mobilenet_v2 = MobileNetV2Model(config, dtype=self.dtype,
                                             param_dtype=self.param_dtype)

    def __call__(self, params, pixel_values=None, **kwargs):
        return self.mobilenet_v2(params["mobilenet_v2"], pixel_values, **kwargs)


class MobileNetV2ForImageClassification(MobileNetV2PreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.mobilenet_v2 = MobileNetV2Model(config, dtype=self.dtype,
                                             param_dtype=self.param_dtype)
        out_ch = (1280 if config.finegrained_output and config.depth_multiplier < 1.0
                  else apply_depth_multiplier(config, 1280))
        self.classifier = Linear(out_ch, config.num_labels, True, dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 kernel_init=normal_init(config.initializer_range))

    def __call__(self, params, pixel_values=None, labels=None, **kwargs):
        out = self.mobilenet_v2(params["mobilenet_v2"], pixel_values)
        logits = self.classifier(params["classifier"], out.pooler_output)
        loss = None
        if labels is not None:
            from ...loss import for_sequence_classification_loss

            loss = for_sequence_classification_loss(logits, labels, self.config)
        return SequenceClassifierOutput(loss=loss, logits=logits)
