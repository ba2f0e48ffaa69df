"""BiT (Big Transfer / ResNetv2), TPU-native (reference
src/transformers/models/bit/modeling_bit.py).

ResNet v2: weight-standardized convolutions (per-output-channel biased
standardization folded into the conv weight at call time), group-norm +
activation, pre-activation or post-activation bottlenecks, TF-style "SAME"
dynamic padding.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from ...core.module import Linear, Module, normal_init
from ...modeling_outputs import SequenceClassifierOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...utils.generic import ModelOutput
from .configuration_bit import BitConfig


@dataclass
class BitModelOutput(ModelOutput):
    last_hidden_state: Any = None
    pooler_output: Any = None
    hidden_states: Any = None


def make_div(value, divisor=8):
    new_value = max(divisor, int(value + divisor / 2) // divisor * divisor)
    if new_value < 0.9 * value:
        new_value += divisor
    return new_value


def _same_pads(size, kernel, stride, dilation):
    pad = max((math.ceil(size / stride) - 1) * stride
              + (kernel - 1) * dilation + 1 - size, 0)
    return pad // 2, pad - pad // 2


class WeightStandardizedConv2d(Module):
    """(reference WeightStandardizedConv2d)."""

    def __init__(self, config, cin, cout, kernel, stride=1, dilation=1,
                 groups=1, eps=1e-8, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.cin, self.cout, self.k = cin, cout, kernel
        self.stride, self.dilation, self.groups = stride, dilation, groups
        self.eps = eps
        padding = config.global_padding
        self.dynamic = False
        if padding is None:
            self.pad = ((stride - 1) + dilation * (kernel - 1)) // 2
        elif padding.lower() == "same":
            if stride == 1 and (dilation * (kernel - 1)) % 2 == 0:
                self.pad = ((stride - 1) + dilation * (kernel - 1)) // 2
            else:
                self.pad = 0
                self.dynamic = True
        elif padding.lower() == "valid":
            self.pad = 0
        else:
            self.pad = int(padding)

    def init(self, rng):
        fan_in = (self.cin // self.groups) * self.k * self.k
        return {"weight": (jax.random.normal(
            rng, (self.cout, self.cin // self.groups, self.k, self.k))
            * (2.0 / fan_in) ** 0.5).astype(self.param_dtype)}

    def __call__(self, params, x):
        w = params["weight"].astype(jnp.float32)
        flat = w.reshape(self.cout, -1)
        mean = flat.mean(-1, keepdims=True)
        var = flat.var(-1, keepdims=True)
        w = ((flat - mean) / jnp.sqrt(var + self.eps)).reshape(w.shape)
        w = w.astype(self.dtype)
        if self.dynamic:
            ph = _same_pads(x.shape[2], self.k, self.stride, self.dilation)
            pw = _same_pads(x.shape[3], self.k, self.stride, self.dilation)
            pads = [ph, pw]
        else:
            pads = [(self.pad, self.pad)] * 2
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), w, (self.stride, self.stride), pads,
            rhs_dilation=(self.dilation, self.dilation),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=self.groups)


class BitGroupNormActivation(Module):
    def __init__(self, config, channels, apply_activation=True, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.channels = channels
        self.groups = config.num_groups
        self.act = get_activation(config.hidden_act) if apply_activation else None

    def init(self, rng):
        return {"weight": jnp.ones((self.channels,), self.param_dtype),
                "bias": jnp.zeros((self.channels,), self.param_dtype)}

    def __call__(self, params, x):
        b, c, h, w = x.shape
        g = self.groups
        xg = x.astype(jnp.float32).reshape(b, g, c // g, h, w)
        mean = xg.mean(axis=(2, 3, 4), keepdims=True)
        var = xg.var(axis=(2, 3, 4), keepdims=True)
        xg = (xg - mean) / jnp.sqrt(var + 1e-5)
        out = xg.reshape(b, c, h, w)
        out = out * params["weight"].astype(jnp.float32)[None, :, None, None] \
            + params["bias"].astype(jnp.float32)[None, :, None, None]
        out = out.astype(x.dtype)
        return self.act(out) if self.act is not None else out


class BitEmbeddings(Module):
    def __init__(self, config: BitConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.convolution = WeightStandardizedConv2d(config, config.num_channels,
                                                    config.embedding_size, 7,
                                                    stride=2, **kw)
        self.pre_pad = not (config.global_padding is not None
                            and config.global_padding.upper() == "SAME")
        self.pool_dynamic = config.embedding_dynamic_padding
        if config.layer_type != "preactivation":
            self.norm = BitGroupNormActivation(config, config.embedding_size, **kw)
        else:
            self.norm = None

    def __call__(self, params, x):
        x = self.convolution(params["convolution"], x)
        if self.pre_pad:
            x = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
        if self.norm is not None:
            x = self.norm(params["norm"], x)
        if self.pool_dynamic:
            ph = _same_pads(x.shape[2], 3, 2, 1)
            pw = _same_pads(x.shape[3], 3, 2, 1)
            x = jnp.pad(x, ((0, 0), (0, 0), ph, pw), constant_values=0.0)
        return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 1, 3, 3),
                                     (1, 1, 2, 2), [(0, 0)] * 4)


class BitDownsampleConv(Module):
    def __init__(self, config, cin, cout, stride, preact, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.conv = WeightStandardizedConv2d(config, cin, cout, 1, stride=stride, **kw)
        self.norm = (None if preact
                     else BitGroupNormActivation(config, cout,
                                                 apply_activation=False, **kw))

    def __call__(self, params, x):
        x = self.conv(params["conv"], x)
        if self.norm is not None:
            x = self.norm(params["norm"], x)
        return x


class BitPreActivationBottleneckLayer(Module):
    def __init__(self, config, cin, cout, stride, dilation, first_dilation,
                 is_first_layer, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        mid = make_div(cout * 0.25)
        if is_first_layer:
            self.downsample = BitDownsampleConv(config, cin, cout, stride, True, **kw)
        else:
            self.downsample = None
        self.norm1 = BitGroupNormActivation(config, cin, **kw)
        self.conv1 = WeightStandardizedConv2d(config, cin, mid, 1, **kw)
        self.norm2 = BitGroupNormActivation(config, mid, **kw)
        self.conv2 = WeightStandardizedConv2d(config, mid, mid, 3, stride=stride,
                                              dilation=first_dilation, **kw)
        self.norm3 = BitGroupNormActivation(config, mid, **kw)
        self.conv3 = WeightStandardizedConv2d(config, mid, cout, 1, **kw)

    def __call__(self, params, x):
        preact = self.norm1(params["norm1"], x)
        shortcut = x
        if self.downsample is not None:
            shortcut = self.downsample(params["downsample"], preact)
        h = self.conv1(params["conv1"], preact)
        h = self.conv2(params["conv2"], self.norm2(params["norm2"], h))
        h = self.conv3(params["conv3"], self.norm3(params["norm3"], h))
        return h + shortcut


class BitBottleneckLayer(Module):
    def __init__(self, config, cin, cout, stride, dilation, first_dilation,
                 is_first_layer, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        mid = make_div(cout * 0.25)
        if is_first_layer:
            self.downsample = BitDownsampleConv(config, cin, cout, stride, False, **kw)
        else:
            self.downsample = None
        self.conv1 = WeightStandardizedConv2d(config, cin, mid, 1, **kw)
        self.norm1 = BitGroupNormActivation(config, mid, **kw)
        self.conv2 = WeightStandardizedConv2d(config, mid, mid, 3, stride=stride,
                                              dilation=first_dilation, **kw)
        self.norm2 = BitGroupNormActivation(config, mid, **kw)
        self.conv3 = WeightStandardizedConv2d(config, mid, cout, 1, **kw)
        self.norm3 = BitGroupNormActivation(config, cout, apply_activation=False, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, x):
        shortcut = x
        if self.downsample is not None:
            shortcut = self.downsample(params["downsample"], x)
        h = self.norm1(params["norm1"], self.conv1(params["conv1"], x))
        h = self.norm2(params["norm2"], self.conv2(params["conv2"], h))
        h = self.norm3(params["norm3"], self.conv3(params["conv3"], h))
        return self.act(h + shortcut)


class BitStage(Module):
    def __init__(self, config, cin, cout, stride, dilation, depth, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        first_dilation = 1 if dilation in (1, 2) else 2
        layer_cls = (BitBottleneckLayer if config.layer_type == "bottleneck"
                     else BitPreActivationBottleneckLayer)
        layers = []
        prev = cin
        for i in range(depth):
            s = stride if i == 0 else 1
            layers.append(layer_cls(config, prev, cout, s, dilation,
                                    first_dilation, i == 0, **kw))
            prev = cout
            first_dilation = dilation
        self.layers = layers

    def __call__(self, params, x):
        for i, layer in enumerate(self.layers):
            x = layer(params["layers"][str(i)], x)
        return x


class BitEncoder(Module):
    def __init__(self, config: BitConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        stages = []
        prev = config.embedding_size
        current_stride = 4
        dilation = 1
        for idx, (depth, hidden) in enumerate(zip(config.depths, config.hidden_sizes)):
            cout = make_div(hidden * config.width_factor)
            stride = 1 if idx == 0 else 2
            if current_stride >= config.output_stride:
                dilation *= stride
                stride = 1
            stages.append(BitStage(config, prev, cout, stride, dilation, depth, **kw))
            prev = cout
            current_stride *= stride
        self.stages = stages
        self.out_channels = prev

    def __call__(self, params, x, output_hidden_states=False):
        all_hidden = [] if output_hidden_states else None
        for i, stage in enumerate(self.stages):
            x = stage(params["stages"][str(i)], x)
            if output_hidden_states:
                all_hidden.append(x)
        return x, all_hidden


class BitModel(Module):
    def __init__(self, config: BitConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embedder = BitEmbeddings(config, **kw)
        self.encoder = BitEncoder(config, **kw)
        if config.layer_type == "preactivation":
            self.norm = BitGroupNormActivation(config, self.encoder.out_channels, **kw)
        else:
            self.norm = None

    def __call__(self, params, pixel_values, output_hidden_states=False, **kwargs):
        x = self.embedder(params["embedder"], jnp.asarray(pixel_values, self.dtype))
        x, all_hidden = self.encoder(params["encoder"], x, output_hidden_states)
        if self.norm is not None:
            x = self.norm(params["norm"], x)
        pooled = x.mean(axis=(2, 3), keepdims=True)
        return BitModelOutput(last_hidden_state=x, pooler_output=pooled,
                              hidden_states=tuple(all_hidden)
                              if all_hidden is not None else None)


class BitPreTrainedModel(PreTrainedModel):
    config_class = BitConfig
    base_model_prefix = "bit"
    main_input_name = "pixel_values"


class BitModelStandalone(BitPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.bit = BitModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, pixel_values=None, **kwargs):
        return self.bit(params["bit"], pixel_values, **kwargs)


class _SeqClassifier(Module):
    """torch Sequential(Flatten, Linear) — Linear at checkpoint index 1."""

    def __init__(self, din, dout, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        setattr(self, "1", Linear(din, dout, True, dtype=dtype,
                                  param_dtype=param_dtype,
                                  kernel_init=normal_init(0.02)))

    def __call__(self, params, x):
        return getattr(self, "1")(params["1"], x)


class BitForImageClassification(BitPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.bit = BitModel(config, **kw)
        self.classifier = _SeqClassifier(self.bit.encoder.out_channels,
                                         config.num_labels, **kw)

    def __call__(self, params, pixel_values=None, labels=None, **kwargs):
        out = self.bit(params["bit"], pixel_values)
        pooled = out.pooler_output.reshape(out.pooler_output.shape[0], -1)
        logits = self.classifier(params["classifier"], pooled)
        loss = None
        if labels is not None:
            from ...loss import for_sequence_classification_loss

            loss = for_sequence_classification_loss(logits, labels, self.config)
        return SequenceClassifierOutput(loss=loss, logits=logits)
