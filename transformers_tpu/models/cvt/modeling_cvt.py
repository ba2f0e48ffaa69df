"""CvT, TPU-native (reference src/transformers/models/cvt/modeling_cvt.py).

Convolutional vision transformer: overlapping conv patch embeddings per
stage; attention q/k/v are produced by depthwise-conv + BatchNorm
projections (k/v on a stride-2 grid), with a CLS token only in the last
stage.
"""

from __future__ import annotations

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
from .configuration_cvt import CvtConfig


@dataclass
class BaseModelOutputWithCLSToken(ModelOutput):
    last_hidden_state: Any = None
    cls_token_value: Any = None
    hidden_states: Any = None


class CvtConvEmbeddings(Module):
    def __init__(self, patch_size, num_channels, embed_dim, stride, padding,
                 *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.projection = Conv(num_channels, embed_dim, patch_size,
                               stride=stride, padding=padding, ndim=2, **kw)
        self.normalization = LayerNorm(embed_dim, 1e-5, **kw)
        self.embed_dim = embed_dim

    def __call__(self, params, x):
        x = self.projection(params["projection"], x)
        b, c, h, w = x.shape
        flat = x.reshape(b, c, h * w).transpose(0, 2, 1)
        flat = self.normalization(params["normalization"], flat)
        return flat.transpose(0, 2, 1).reshape(b, c, h, w)


class _ConvProjection(Module):
    """depthwise conv + BN (reference CvtSelfAttentionConvProjection)."""

    def __init__(self, embed_dim, kernel, padding, stride, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.convolution = Conv(embed_dim, embed_dim, kernel, stride=stride,
                                padding=padding, use_bias=False,
                                groups=embed_dim, ndim=2, **kw)
        self.normalization = BatchNorm(embed_dim, 1e-5, **kw)

    def __call__(self, params, x):  # [b, c, h, w] -> [b, n, c]
        x = self.normalization(params["normalization"],
                               self.convolution(params["convolution"], x))
        b, c, h, w = x.shape
        return x.reshape(b, c, h * w).transpose(0, 2, 1)


class CvtSelfAttention(Module):
    def __init__(self, config, stage, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        lk = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        dim = config.embed_dim[stage]
        self.embed_dim = dim
        self.num_heads = config.num_heads[stage]
        self.scale = dim ** -0.5
        self.with_cls_token = config.cls_token[stage]
        k = config.kernel_qkv[stage]
        self.convolution_projection_query = _Wrap(_ConvProjection(
            dim, k, config.padding_q[stage], config.stride_q[stage], **kw), **kw)
        self.convolution_projection_key = _Wrap(_ConvProjection(
            dim, k, config.padding_kv[stage], config.stride_kv[stage], **kw), **kw)
        self.convolution_projection_value = _Wrap(_ConvProjection(
            dim, k, config.padding_kv[stage], config.stride_kv[stage], **kw), **kw)
        self.projection_query = Linear(dim, dim, config.qkv_bias[stage], **lk)
        self.projection_key = Linear(dim, dim, config.qkv_bias[stage], **lk)
        self.projection_value = Linear(dim, dim, config.qkv_bias[stage], **lk)

    def _heads(self, x):
        b, t, _ = x.shape
        hd = self.embed_dim // self.num_heads
        return x.reshape(b, t, self.num_heads, hd)

    def __call__(self, params, hidden, height, width):
        if self.with_cls_token:
            cls, hidden = hidden[:, :1], hidden[:, 1:]
        b, n, c = hidden.shape
        grid = hidden.transpose(0, 2, 1).reshape(b, c, height, width)
        q = self.convolution_projection_query(
            params["convolution_projection_query"], grid)
        k = self.convolution_projection_key(
            params["convolution_projection_key"], grid)
        v = self.convolution_projection_value(
            params["convolution_projection_value"], grid)
        if self.with_cls_token:
            q = jnp.concatenate([cls, q], axis=1)
            k = jnp.concatenate([cls, k], axis=1)
            v = jnp.concatenate([cls, v], axis=1)
        q = self._heads(self.projection_query(params["projection_query"], q))
        k = self._heads(self.projection_key(params["projection_key"], k))
        v = self._heads(self.projection_value(params["projection_value"], v))
        scores = jnp.einsum("blhd,bthd->bhlt", q, k) * self.scale
        probs = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(self.dtype)
        ctx = jnp.einsum("bhlt,bthd->blhd", probs, v)
        return ctx.reshape(b, -1, c)


class _Wrap(Module):
    """checkpoint nesting convolution_projection.{convolution,normalization}."""

    def __init__(self, proj, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.convolution_projection = proj

    def __call__(self, params, x):
        return self.convolution_projection(params["convolution_projection"], x)


class CvtLayer(Module):
    def __init__(self, config, stage, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        lk = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        dim = config.embed_dim[stage]
        inter = int(dim * config.mlp_ratio[stage])
        self.attention = _AttnWrap(config, stage, **kw)
        self.intermediate = _Dense(dim, inter, "gelu", **kw)
        self.output = _Dense(inter, dim, None, **kw)
        self.layernorm_before = LayerNorm(dim, 1e-5, **kw)
        self.layernorm_after = LayerNorm(dim, 1e-5, **kw)

    def __call__(self, params, hidden, height, width):
        attn = self.attention(params["attention"],
                              self.layernorm_before(params["layernorm_before"],
                                                    hidden), height, width)
        hidden = attn + hidden
        h = self.layernorm_after(params["layernorm_after"], hidden)
        h = self.intermediate(params["intermediate"], h)
        return self.output(params["output"], h) + hidden


class _AttnWrap(Module):
    def __init__(self, config, stage, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.attention = CvtSelfAttention(config, stage, **kw)
        self.output = _SelfOut(config.embed_dim[stage], config, **kw)

    def __call__(self, params, hidden, height, width):
        ctx = self.attention(params["attention"], hidden, height, width)
        return self.output(params["output"], ctx)


class _SelfOut(Module):
    def __init__(self, dim, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.dense = Linear(dim, dim, True, dtype=dtype, param_dtype=param_dtype,
                            kernel_init=normal_init(config.initializer_range))

    def __call__(self, params, x):
        return self.dense(params["dense"], x)


class _Dense(Module):
    def __init__(self, din, dout, act, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.dense = Linear(din, dout, True, dtype=dtype, param_dtype=param_dtype,
                            kernel_init=normal_init(0.02))
        self.act = get_activation(act) if act else None

    def __call__(self, params, x):
        h = self.dense(params["dense"], x)
        return self.act(h) if self.act else h


class CvtStage(Module):
    def __init__(self, config, stage, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.stage = stage
        self.embedding = _Embeddings(config, stage, **kw)
        self.layers = [CvtLayer(config, stage, **kw)
                       for _ in range(config.depth[stage])]
        self.has_cls = config.cls_token[stage]

    def init(self, rng):
        params = super().init(rng)
        if self.has_cls:
            params["cls_token"] = jax.random.normal(
                rng, (1, 1, self.config.embed_dim[-1])).astype(self.param_dtype)
        return params

    def __call__(self, params, x):
        cls_token = None
        x = self.embedding(params["embedding"], x)
        b, c, h, w = x.shape
        hidden = x.reshape(b, c, h * w).transpose(0, 2, 1)
        if self.has_cls:
            cls_token = jnp.broadcast_to(params["cls_token"].astype(hidden.dtype),
                                         (b, 1, c))
            hidden = jnp.concatenate([cls_token, hidden], axis=1)
        for i, layer in enumerate(self.layers):
            hidden = layer(params["layers"][str(i)], hidden, h, w)
        if self.has_cls:
            cls_token, hidden = hidden[:, :1], hidden[:, 1:]
        hidden = hidden.transpose(0, 2, 1).reshape(b, c, h, w)
        return hidden, cls_token


class _Embeddings(Module):
    def __init__(self, config, stage, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.convolution_embeddings = CvtConvEmbeddings(
            config.patch_sizes[stage],
            config.num_channels if stage == 0 else config.embed_dim[stage - 1],
            config.embed_dim[stage], config.patch_stride[stage],
            config.patch_padding[stage], dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, x):
        return self.convolution_embeddings(params["convolution_embeddings"], x)


class CvtModel(Module):
    def __init__(self, config: CvtConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.encoder = _Encoder(config, dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, pixel_values, output_hidden_states=False, **kwargs):
        x = jnp.asarray(pixel_values, self.dtype)
        cls_token = None
        all_hidden = [] if output_hidden_states else None
        for i, stage in enumerate(self.encoder.stages):
            x, cls_token = stage(params["encoder"]["stages"][str(i)], x)
            if output_hidden_states:
                all_hidden.append(x)
        return BaseModelOutputWithCLSToken(
            last_hidden_state=x, cls_token_value=cls_token,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None)


class _Encoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.stages = [CvtStage(config, i, dtype=dtype, param_dtype=param_dtype)
                       for i in range(len(config.depth))]


class CvtPreTrainedModel(PreTrainedModel):
    config_class = CvtConfig
    base_model_prefix = "cvt"
    main_input_name = "pixel_values"
    _keys_to_ignore_on_load_unexpected = (r"num_batches_tracked$",)


class CvtModelStandalone(CvtPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.cvt = CvtModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, pixel_values=None, **kwargs):
        return self.cvt(params["cvt"], pixel_values, **kwargs)


class CvtForImageClassification(CvtPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.cvt = CvtModel(config, **kw)
        self.layernorm = LayerNorm(config.embed_dim[-1], 1e-5, **kw)
        self.classifier = Linear(config.embed_dim[-1], config.num_labels, True,
                                 kernel_init=normal_init(config.initializer_range),
                                 **kw)

    def __call__(self, params, pixel_values=None, labels=None, **kwargs):
        out = self.cvt(params["cvt"], pixel_values)
        if self.config.cls_token[-1]:
            seq = self.layernorm(params["layernorm"], out.cls_token_value)
        else:
            b, c, h, w = out.last_hidden_state.shape
            seq = out.last_hidden_state.reshape(b, c, h * w).transpose(0, 2, 1)
            seq = self.layernorm(params["layernorm"], seq)
        logits = self.classifier(params["classifier"], seq.mean(axis=1))
        loss = None
        if labels is not None:
            from ...loss import for_sequence_classification_loss

            loss = for_sequence_classification_loss(logits, labels, self.config)
        return SequenceClassifierOutput(loss=loss, logits=logits)
