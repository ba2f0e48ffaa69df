"""EfficientNet (reference src/transformers/models/efficientnet/modeling_efficientnet.py).

MBConv tower: width/depth-scaled blocks of 1x1 expansion → depthwise (with
the TF asymmetric stride-2 padding) → squeeze-excite → 1x1 projection with
residual on same-shape repeats; swish activations, 1x1 top conv, mean pool."""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from ...core.module import BatchNorm, Conv, Linear, Module, normal_init
from ...modeling_outputs import SequenceClassifierOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...utils.generic import ModelOutput
from .configuration_efficientnet import EfficientNetConfig


@dataclass
class EfficientNetModelOutput(ModelOutput):
    last_hidden_state: Any = None
    pooler_output: Any = None
    hidden_states: Any = None


def round_filters(config, num_channels):
    divisor = config.depth_divisor
    num_channels *= config.width_coefficient
    new_dim = max(divisor, int(num_channels + divisor / 2) // divisor * divisor)
    if new_dim < 0.9 * num_channels:
        new_dim += divisor
    return int(new_dim)


class EfficientNetEmbeddings(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        out = round_filters(config, 32)
        self.convolution = Conv(config.num_channels, out, 3, stride=2, use_bias=False,
                                ndim=2, dtype=dtype, param_dtype=param_dtype)
        self.batchnorm = BatchNorm(out, config.batch_norm_eps, dtype=dtype,
                                   param_dtype=param_dtype)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, x):
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1)))
        x = self.convolution(params["convolution"], x)
        return self.act(self.batchnorm(params["batchnorm"], x))


class EfficientNetExpansionLayer(Module):
    def __init__(self, config, in_dim, out_dim, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.expand_conv = Conv(in_dim, out_dim, 1, use_bias=False, ndim=2,
                                dtype=dtype, param_dtype=param_dtype)
        self.expand_bn = BatchNorm(out_dim, config.batch_norm_eps, dtype=dtype,
                                   param_dtype=param_dtype)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, x):
        x = self.expand_conv(params["expand_conv"], x)
        return self.act(self.expand_bn(params["expand_bn"], x))


class EfficientNetDepthwiseLayer(Module):
    def __init__(self, config, in_dim, stride, kernel_size, adjust_padding,
                 *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.stride = stride
        self.kernel = kernel_size
        c = kernel_size // 2
        self.pad2 = (c - 1, c, c - 1, c) if adjust_padding else (c, c, c, c)
        pad = 0 if stride == 2 else kernel_size // 2
        self.depthwise_conv = Conv(in_dim, in_dim, kernel_size, stride=stride,
                                   padding=pad, use_bias=False, groups=in_dim,
                                   ndim=2, dtype=dtype, param_dtype=param_dtype)
        self.depthwise_norm = BatchNorm(in_dim, config.batch_norm_eps, dtype=dtype,
                                        param_dtype=param_dtype)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, x):
        if self.stride == 2:
            l, r, t, b = self.pad2
            x = jnp.pad(x, ((0, 0), (0, 0), (t, b), (l, r)))
        x = self.depthwise_conv(params["depthwise_conv"], x)
        return self.act(self.depthwise_norm(params["depthwise_norm"], x))


class EfficientNetSqueezeExciteLayer(Module):
    def __init__(self, config, in_dim, expand_dim, expand, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        dim = expand_dim if expand else in_dim
        dim_se = max(1, int(in_dim * config.squeeze_expansion_ratio))
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.reduce = Conv(dim, dim_se, 1, use_bias=True, ndim=2, **kw)
        self.expand = Conv(dim_se, dim, 1, use_bias=True, ndim=2, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, x):
        pooled = x.mean(axis=(2, 3), keepdims=True)
        a = self.act(self.reduce(params["reduce"], pooled))
        a = jax.nn.sigmoid(self.expand(params["expand"], a))
        return x * a


class EfficientNetFinalBlockLayer(Module):
    def __init__(self, config, in_dim, out_dim, stride, id_skip, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.apply_residual = stride == 1 and not id_skip
        self.project_conv = Conv(in_dim, out_dim, 1, use_bias=False, ndim=2,
                                 dtype=dtype, param_dtype=param_dtype)
        self.project_bn = BatchNorm(out_dim, config.batch_norm_eps, dtype=dtype,
                                    param_dtype=param_dtype)

    def __call__(self, params, embeddings, x):
        x = self.project_bn(params["project_bn"],
                            self.project_conv(params["project_conv"], x))
        if self.apply_residual:
            x = x + embeddings
        return x


class EfficientNetBlock(Module):
    def __init__(self, config, in_dim, out_dim, stride, kernel_size, expand_ratio,
                 id_skip, adjust_padding, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.expand_ratio = expand_ratio
        expand_dim = in_dim * expand_ratio
        if expand_ratio != 1:
            self.expansion = EfficientNetExpansionLayer(config, in_dim, expand_dim, **kw)
        self.depthwise_conv = EfficientNetDepthwiseLayer(
            config, expand_dim if expand_ratio != 1 else in_dim, stride, kernel_size,
            adjust_padding, **kw)
        self.squeeze_excite = EfficientNetSqueezeExciteLayer(
            config, in_dim, expand_dim, expand_ratio != 1, **kw)
        self.projection = EfficientNetFinalBlockLayer(
            config, expand_dim if expand_ratio != 1 else in_dim, out_dim, stride,
            id_skip, **kw)

    def __call__(self, params, x):
        embeddings = x
        if self.expand_ratio != 1:
            x = self.expansion(params["expansion"], x)
        x = self.depthwise_conv(params["depthwise_conv"], x)
        x = self.squeeze_excite(params["squeeze_excite"], x)
        return self.projection(params["projection"], embeddings, x)


class EfficientNetModel(Module):
    def __init__(self, config: EfficientNetConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embeddings = EfficientNetEmbeddings(config, **kw)

        def round_repeats(r):
            return int(math.ceil(config.depth_coefficient * r))

        blocks = []
        curr = 0
        out_dim = round_filters(config, config.out_channels[-1])
        for i in range(len(config.in_channels)):
            in_dim = round_filters(config, config.in_channels[i])
            out_dim = round_filters(config, config.out_channels[i])
            for j in range(round_repeats(config.num_block_repeats[i])):
                id_skip = j == 0
                stride = config.strides[i] if j == 0 else 1
                bin_dim = in_dim if j == 0 else out_dim
                adjust = curr not in config.depthwise_padding
                blocks.append(EfficientNetBlock(
                    config, bin_dim, out_dim, stride, config.kernel_sizes[i],
                    config.expand_ratios[i], id_skip, adjust, **kw))
                curr += 1
        self.encoder = _EfficientNetEncoder(config, blocks, out_dim, **kw)

    def __call__(self, params, pixel_values, output_hidden_states=False, **kwargs):
        x = self.embeddings(params["embeddings"], jnp.asarray(pixel_values, self.dtype))
        x = self.encoder(params["encoder"], x)
        pooled = x.mean(axis=(2, 3))
        return EfficientNetModelOutput(last_hidden_state=x, pooler_output=pooled)


class _EfficientNetEncoder(Module):
    def __init__(self, config, blocks, last_dim, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.blocks = blocks
        self.top_conv = Conv(last_dim, round_filters(config, 1280), 1, use_bias=False,
                             ndim=2, dtype=dtype, param_dtype=param_dtype)
        self.top_bn = BatchNorm(config.hidden_dim, config.batch_norm_eps, dtype=dtype,
                                param_dtype=param_dtype)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, x):
        for i, block in enumerate(self.blocks):
            x = block(params["blocks"][str(i)], x)
        x = self.top_conv(params["top_conv"], x)
        return self.act(self.top_bn(params["top_bn"], x))


class EfficientNetPreTrainedModel(PreTrainedModel):
    config_class = EfficientNetConfig
    base_model_prefix = "efficientnet"
    _keys_to_ignore_on_load_unexpected = (r"num_batches_tracked$",)


class EfficientNetModelStandalone(EfficientNetPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.efficientnet = EfficientNetModel(config, dtype=self.dtype,
                                              param_dtype=self.param_dtype)

    def __call__(self, params, pixel_values=None, **kwargs):
        return self.efficientnet(params["efficientnet"], pixel_values, **kwargs)


class EfficientNetForImageClassification(EfficientNetPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.efficientnet = EfficientNetModel(config, dtype=self.dtype,
                                              param_dtype=self.param_dtype)
        self.classifier = Linear(config.hidden_dim, config.num_labels, True,
                                 dtype=self.dtype, param_dtype=self.param_dtype,
                                 kernel_init=normal_init(config.initializer_range))

    def __call__(self, params, pixel_values=None, labels=None, **kwargs):
        out = self.efficientnet(params["efficientnet"], pixel_values)
        logits = self.classifier(params["classifier"], out.pooler_output)
        loss = None
        if labels is not None:
            from ...loss import for_sequence_classification_loss

            loss = for_sequence_classification_loss(logits, labels, self.config)
        return SequenceClassifierOutput(loss=loss, logits=logits)
