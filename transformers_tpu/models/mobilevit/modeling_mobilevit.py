"""MobileViT, TPU-native (reference src/transformers/models/mobilevit/modeling_mobilevit.py).

Hybrid conv/transformer backbone: MobileNetV2 inverted-residual stages
interleaved with MobileViT blocks that unfold the feature map into
non-overlapping patches (pure static reshapes/transposes), run a small
pre-LN ViT over them, and fold back.  Heads: image classification and
DeepLabV3 semantic segmentation (ASPP atrous pyramid).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from ...core.module import (BatchNorm, Conv, LayerNorm, Linear, Module,
                            normal_init)
from ...modeling_outputs import SequenceClassifierOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...utils.generic import ModelOutput
from ..dpt.modeling_dpt import resize_bilinear
from ..mobilenet_v2.modeling_mobilenet_v2 import make_divisible
from .configuration_mobilevit import MobileViTConfig


@dataclass
class MobileViTModelOutput(ModelOutput):
    last_hidden_state: Any = None
    pooler_output: Any = None
    hidden_states: Any = None


@dataclass
class SemanticSegmenterOutput(ModelOutput):
    loss: Any = None
    logits: Any = None
    hidden_states: Any = None


class MobileViTConvLayer(Module):
    """conv → optional BN → optional act (reference MobileViTConvLayer)."""

    def __init__(self, config, in_ch, out_ch, kernel_size, stride=1, groups=1,
                 bias=False, dilation=1, use_normalization=True,
                 use_activation=True, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        padding = (kernel_size - 1) // 2 * dilation
        self.convolution = Conv(in_ch, out_ch, kernel_size, stride=stride,
                                padding=padding, use_bias=bias, groups=groups,
                                dilation=dilation, ndim=2, dtype=dtype,
                                param_dtype=param_dtype)
        self.use_norm = use_normalization
        if use_normalization:
            self.normalization = BatchNorm(out_ch, 1e-5, dtype=dtype,
                                           param_dtype=param_dtype)
        if use_activation:
            self.act = get_activation(use_activation if isinstance(use_activation, str)
                                      else config.hidden_act)
        else:
            self.act = None

    def __call__(self, params, x):
        x = self.convolution(params["convolution"], x)
        if self.use_norm:
            x = self.normalization(params["normalization"], x)
        return self.act(x) if self.act is not None else x


class MobileViTInvertedResidual(Module):
    def __init__(self, config, in_ch, out_ch, stride, dilation=1, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        expanded = make_divisible(int(round(in_ch * config.expand_ratio)), 8)
        self.use_residual = stride == 1 and in_ch == out_ch
        self.expand_1x1 = MobileViTConvLayer(config, in_ch, expanded, 1, **kw)
        self.conv_3x3 = MobileViTConvLayer(config, expanded, expanded, 3,
                                           stride=stride, groups=expanded,
                                           dilation=dilation, **kw)
        self.reduce_1x1 = MobileViTConvLayer(config, expanded, out_ch, 1,
                                             use_activation=False, **kw)

    def __call__(self, params, x):
        h = self.expand_1x1(params["expand_1x1"], x)
        h = self.conv_3x3(params["conv_3x3"], h)
        h = self.reduce_1x1(params["reduce_1x1"], h)
        return x + h if self.use_residual else h


class MobileViTMobileNetLayer(Module):
    def __init__(self, config, in_ch, out_ch, stride=1, num_stages=1, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        layers = []
        for i in range(num_stages):
            layers.append(MobileViTInvertedResidual(
                config, in_ch, out_ch, stride if i == 0 else 1,
                dtype=dtype, param_dtype=param_dtype))
            in_ch = out_ch
        self.layer = layers

    def __call__(self, params, x):
        for i, layer in enumerate(self.layer):
            x = layer(params["layer"][str(i)], x)
        return x


class _ViTSubLayer(Module):
    """BERT-style attention/FF blocks with MobileViT naming."""

    def __init__(self, config, hidden_size, intermediate_size, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.num_heads = config.num_attention_heads
        self.head_dim = hidden_size // config.num_attention_heads
        self.attention = _AttnHolder(config, hidden_size, **kw)
        self.intermediate = _Dense(hidden_size, intermediate_size, **kw)
        self.output = _Dense(intermediate_size, hidden_size, **kw)
        self.layernorm_before = LayerNorm(hidden_size, config.layer_norm_eps,
                                          dtype=dtype, param_dtype=param_dtype)
        self.layernorm_after = LayerNorm(hidden_size, config.layer_norm_eps,
                                         dtype=dtype, param_dtype=param_dtype)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, hidden):
        h = self.layernorm_before(params["layernorm_before"], hidden)
        b, s, e = h.shape
        a = self.attention
        q = a.attention.query(params["attention"]["attention"]["query"], h)
        k = a.attention.key(params["attention"]["attention"]["key"], h)
        v = a.attention.value(params["attention"]["attention"]["value"], h)
        q = q.reshape(b, s, self.num_heads, self.head_dim)
        k = k.reshape(b, s, self.num_heads, self.head_dim)
        v = v.reshape(b, s, self.num_heads, self.head_dim)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(self.head_dim)
        probs = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(self.dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, e)
        attn_out = a.output.dense(params["attention"]["output"]["dense"], ctx)
        hidden = attn_out + hidden
        h = self.layernorm_after(params["layernorm_after"], hidden)
        h = self.act(self.intermediate.dense(params["intermediate"]["dense"], h))
        return self.output.dense(params["output"]["dense"], h) + hidden


class _AttnHolder(Module):
    def __init__(self, config, hidden_size, *, dtype, param_dtype, kernel_init):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=kernel_init)
        self.attention = _QKV(config, hidden_size, **kw)
        self.output = _Dense(hidden_size, hidden_size, **kw)


class _QKV(Module):
    def __init__(self, config, hidden_size, *, dtype, param_dtype, kernel_init):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=kernel_init)
        self.query = Linear(hidden_size, hidden_size, config.qkv_bias, **kw)
        self.key = Linear(hidden_size, hidden_size, config.qkv_bias, **kw)
        self.value = Linear(hidden_size, hidden_size, config.qkv_bias, **kw)


class _Dense(Module):
    def __init__(self, din, dout, *, dtype, param_dtype, kernel_init):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.dense = Linear(din, dout, True, dtype=dtype, param_dtype=param_dtype,
                            kernel_init=kernel_init)


class MobileViTLayer(Module):
    """MobileViT block: downsample → local convs → unfold → transformer →
    fold → project → fuse (reference MobileViTLayer)."""

    def __init__(self, config, in_ch, out_ch, stride, hidden_size, num_stages,
                 dilation=1, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.patch = config.patch_size
        self.has_down = stride == 2
        if self.has_down:
            self.downsampling_layer = MobileViTInvertedResidual(
                config, in_ch, out_ch, stride if dilation == 1 else 1,
                dilation // 2 if dilation > 1 else 1, **kw)
            in_ch = out_ch
        self.conv_kxk = MobileViTConvLayer(config, in_ch, in_ch,
                                           config.conv_kernel_size, **kw)
        self.conv_1x1 = MobileViTConvLayer(config, in_ch, hidden_size, 1,
                                           use_normalization=False,
                                           use_activation=False, **kw)
        inter = int(hidden_size * config.mlp_ratio)
        self.transformer = _Transformer(config, hidden_size, inter, num_stages, **kw)
        self.layernorm = LayerNorm(hidden_size, config.layer_norm_eps, **kw)
        self.conv_projection = MobileViTConvLayer(config, hidden_size, in_ch, 1, **kw)
        self.fusion = MobileViTConvLayer(config, 2 * in_ch, in_ch,
                                         config.conv_kernel_size, **kw)

    def unfold(self, x):
        p = self.patch
        b, c, h, w = x.shape
        nh, nw = math.ceil(h / p) * p, math.ceil(w / p) * p
        interpolate = (nh, nw) != (h, w)
        if interpolate:
            x = resize_bilinear(x, (nh, nw), align_corners=False)
        nph, npw = nh // p, nw // p
        num = nph * npw
        patches = x.reshape(b * c * nph, p, npw, p)
        patches = patches.transpose(0, 2, 1, 3)
        patches = patches.reshape(b, c, num, p * p)
        patches = patches.transpose(0, 3, 2, 1)
        patches = patches.reshape(b * p * p, num, c)
        return patches, (b, c, h, w, nph, npw, interpolate)

    def fold(self, patches, info):
        p = self.patch
        b, c, h, w, nph, npw, interpolate = info
        num = nph * npw
        x = patches.reshape(b, p * p, num, c)
        x = x.transpose(0, 3, 2, 1)
        x = x.reshape(b * c * nph, npw, p, p)
        x = x.transpose(0, 2, 1, 3)
        x = x.reshape(b, c, nph * p, npw * p)
        if interpolate:
            x = resize_bilinear(x, (h, w), align_corners=False)
        return x

    def __call__(self, params, x):
        if self.has_down:
            x = self.downsampling_layer(params["downsampling_layer"], x)
        residual = x
        h = self.conv_kxk(params["conv_kxk"], x)
        h = self.conv_1x1(params["conv_1x1"], h)
        patches, info = self.unfold(h)
        for i, layer in enumerate(self.transformer.layer):
            patches = layer(params["transformer"]["layer"][str(i)], patches)
        patches = self.layernorm(params["layernorm"], patches)
        h = self.fold(patches, info)
        h = self.conv_projection(params["conv_projection"], h)
        return self.fusion(params["fusion"], jnp.concatenate([residual, h], axis=1))


class _Transformer(Module):
    def __init__(self, config, hidden_size, inter, num_stages, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.layer = [_ViTSubLayer(config, hidden_size, inter, dtype=dtype,
                                   param_dtype=param_dtype)
                      for _ in range(num_stages)]


class MobileViTEncoder(Module):
    def __init__(self, config: MobileViTConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        n = config.neck_hidden_sizes
        dilate4 = config.output_stride == 8
        dilate5 = config.output_stride in (8, 16)
        dilation = 1
        layers = [MobileViTMobileNetLayer(config, n[0], n[1], 1, 1, **kw),
                  MobileViTMobileNetLayer(config, n[1], n[2], 2, 3, **kw),
                  MobileViTLayer(config, n[2], n[3], 2, config.hidden_sizes[0], 2, **kw)]
        if dilate4:
            dilation *= 2
        layers.append(MobileViTLayer(config, n[3], n[4], 2, config.hidden_sizes[1],
                                     4, dilation, **kw))
        if dilate5:
            dilation *= 2
        layers.append(MobileViTLayer(config, n[4], n[5], 2, config.hidden_sizes[2],
                                     3, dilation, **kw))
        self.layer = layers

    def __call__(self, params, x, output_hidden_states=False):
        hidden = []
        for i, layer in enumerate(self.layer):
            x = layer(params["layer"][str(i)], x)
            hidden.append(x)
        return x, tuple(hidden) if output_hidden_states else None


class MobileViTModel(Module):
    def __init__(self, config: MobileViTConfig, expand_output=True, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.expand_output = expand_output
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.conv_stem = MobileViTConvLayer(config, config.num_channels,
                                            config.neck_hidden_sizes[0], 3,
                                            stride=2, **kw)
        self.encoder = MobileViTEncoder(config, **kw)
        if expand_output:
            self.conv_1x1_exp = MobileViTConvLayer(config, config.neck_hidden_sizes[5],
                                                   config.neck_hidden_sizes[6], 1, **kw)

    def __call__(self, params, pixel_values, output_hidden_states=False, **kwargs):
        x = self.conv_stem(params["conv_stem"], jnp.asarray(pixel_values, self.dtype))
        x, hidden = self.encoder(params["encoder"], x, output_hidden_states)
        pooled = None
        if self.expand_output:
            x = self.conv_1x1_exp(params["conv_1x1_exp"], x)
            pooled = x.mean(axis=(2, 3))
        return MobileViTModelOutput(last_hidden_state=x, pooler_output=pooled,
                                    hidden_states=hidden)


class MobileViTPreTrainedModel(PreTrainedModel):
    config_class = MobileViTConfig
    base_model_prefix = "mobilevit"
    _keys_to_ignore_on_load_unexpected = (r"num_batches_tracked$",)


class MobileViTModelStandalone(MobileViTPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.mobilevit = MobileViTModel(config, dtype=self.dtype,
                                        param_dtype=self.param_dtype)

    def __call__(self, params, pixel_values=None, **kwargs):
        return self.mobilevit(params["mobilevit"], pixel_values, **kwargs)


class MobileViTForImageClassification(MobileViTPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.mobilevit = MobileViTModel(config, dtype=self.dtype,
                                        param_dtype=self.param_dtype)
        self.classifier = Linear(config.neck_hidden_sizes[6], config.num_labels,
                                 True, dtype=self.dtype, param_dtype=self.param_dtype,
                                 kernel_init=normal_init(config.initializer_range))

    def __call__(self, params, pixel_values=None, labels=None, **kwargs):
        out = self.mobilevit(params["mobilevit"], pixel_values)
        logits = self.classifier(params["classifier"], out.pooler_output)
        loss = None
        if labels is not None:
            from ...loss import for_sequence_classification_loss

            loss = for_sequence_classification_loss(logits, labels, self.config)
        return SequenceClassifierOutput(loss=loss, logits=logits)


class MobileViTASPPPooling(Module):
    def __init__(self, config, in_ch, out_ch, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.conv_1x1 = MobileViTConvLayer(config, in_ch, out_ch, 1,
                                           use_activation="relu", dtype=dtype,
                                           param_dtype=param_dtype)

    def __call__(self, params, x):
        hw = x.shape[-2:]
        pooled = x.mean(axis=(2, 3), keepdims=True)
        h = self.conv_1x1(params["conv_1x1"], pooled)
        return jnp.broadcast_to(h, h.shape[:2] + hw)


class MobileViTASPP(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        in_ch = config.neck_hidden_sizes[-2]
        out_ch = config.aspp_out_channels
        convs = [MobileViTConvLayer(config, in_ch, out_ch, 1,
                                    use_activation="relu", **kw)]
        convs += [MobileViTConvLayer(config, in_ch, out_ch, 3, dilation=rate,
                                     use_activation="relu", **kw)
                  for rate in config.atrous_rates]
        convs.append(MobileViTASPPPooling(config, in_ch, out_ch, **kw))
        self.convs = convs
        self.project = MobileViTConvLayer(config, 5 * out_ch, out_ch, 1,
                                          use_activation="relu", **kw)

    def __call__(self, params, x):
        pyramid = [conv(params["convs"][str(i)], x)
                   for i, conv in enumerate(self.convs)]
        return self.project(params["project"], jnp.concatenate(pyramid, axis=1))


class MobileViTDeepLabV3(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.aspp = MobileViTASPP(config, **kw)
        self.classifier = MobileViTConvLayer(config, config.aspp_out_channels,
                                             config.num_labels, 1,
                                             use_normalization=False,
                                             use_activation=False, bias=True, **kw)

    def __call__(self, params, hidden_states):
        h = self.aspp(params["aspp"], hidden_states[-1])
        return self.classifier(params["classifier"], h)


class MobileViTForSemanticSegmentation(MobileViTPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.mobilevit = MobileViTModel(config, expand_output=False, **kw)
        self.segmentation_head = MobileViTDeepLabV3(config, **kw)

    def __call__(self, params, pixel_values=None, labels=None, **kwargs):
        out = self.mobilevit(params["mobilevit"], pixel_values,
                             output_hidden_states=True)
        logits = self.segmentation_head(params["segmentation_head"],
                                        out.hidden_states)
        loss = None
        if labels is not None:
            upsampled = resize_bilinear(logits, labels.shape[-2:],
                                        align_corners=False)
            valid = labels != self.config.semantic_loss_ignore_index
            safe = jnp.where(valid, labels, 0)
            logp = jax.nn.log_softmax(upsampled.astype(jnp.float32), axis=1)
            picked = jnp.take_along_axis(logp, safe[:, None], axis=1)[:, 0]
            loss = -(picked * valid).sum() / jnp.maximum(valid.sum(), 1)
        return SemanticSegmenterOutput(loss=loss, logits=logits)
