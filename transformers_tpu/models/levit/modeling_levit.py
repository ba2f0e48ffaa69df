"""LeViT, TPU-native (reference src/transformers/models/levit/modeling_levit.py).

A conv/transformer hybrid: a 4-layer conv stem (each conv + inference-mode
BatchNorm + hardswish) downsamples 16x, then three transformer stages with
BN-after-linear projections (instead of LayerNorm), learned attention biases
indexed by relative-offset tables, and shrinking resolution via
stride-2 "attention subsample" blocks (reference modeling_levit.py:213).

All attention-bias index tables are static Python data computed at build time
(the reference keeps them as non-persistent buffers), so the gathers fold into
constant-index takes under jit.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ...core.module import BatchNorm, Conv, Linear, Module, normal_init
from ...modeling_outputs import SequenceClassifierOutput
from ...modeling_utils import PreTrainedModel
from ...utils.generic import ModelOutput
from .configuration_levit import LevitConfig


@dataclass
class LevitModelOutput(ModelOutput):
    last_hidden_state: Any = None
    pooler_output: Any = None
    hidden_states: Any = None


@dataclass
class LevitTeacherOutput(ModelOutput):
    logits: Any = None
    cls_logits: Any = None
    distillation_logits: Any = None
    hidden_states: Any = None


class _BN1d(Module):
    """Inference-mode BatchNorm1d applied over the LAST axis of [..., C]
    (the reference flattens [B, S, C] -> [B*S, C]; with running statistics the
    two are identical, so we keep the token axis and broadcast)."""

    def __init__(self, num_features, eps=1e-5, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.num_features = num_features
        self.eps = eps

    def init(self, rng):
        return {
            "weight": jnp.ones((self.num_features,), self.param_dtype),
            "bias": jnp.zeros((self.num_features,), self.param_dtype),
            "running_mean": jnp.zeros((self.num_features,), self.param_dtype),
            "running_var": jnp.ones((self.num_features,), self.param_dtype),
        }

    def __call__(self, params, x):
        mean = params["running_mean"].astype(jnp.float32)
        var = params["running_var"].astype(jnp.float32)
        w = params["weight"].astype(jnp.float32)
        b = params["bias"].astype(jnp.float32)
        h = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.eps)
        return (h * w + b).astype(x.dtype)


class MLPLayerWithBN(Module):
    """Bias-free Linear + BatchNorm1d (reference modeling_levit.py:125)."""

    def __init__(self, input_dim, output_dim, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.linear = Linear(input_dim, output_dim, False, dtype=dtype,
                             param_dtype=param_dtype)
        self.batch_norm = _BN1d(output_dim, dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, x):
        return self.batch_norm(params["batch_norm"],
                               self.linear(params["linear"], x))


class LevitConvEmbeddings(Module):
    """Bias-free Conv2d + BatchNorm2d (reference modeling_levit.py:61)."""

    def __init__(self, cin, cout, kernel, stride, padding, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.convolution = Conv(cin, cout, kernel, stride=stride,
                                padding=padding, use_bias=False, ndim=2, **kw)
        self.batch_norm = BatchNorm(cout, **kw)

    def __call__(self, params, x):
        return self.batch_norm(params["batch_norm"],
                               self.convolution(params["convolution"], x))


class LevitPatchEmbeddings(Module):
    """4x (conv-BN, hardswish between) stem; flattens to tokens
    (reference modeling_levit.py:81)."""

    def __init__(self, config: LevitConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        c0 = config.hidden_sizes[0]
        args = (config.kernel_size, config.stride, config.padding)
        self.embedding_layer_1 = LevitConvEmbeddings(config.num_channels,
                                                     c0 // 8, *args, **kw)
        self.embedding_layer_2 = LevitConvEmbeddings(c0 // 8, c0 // 4, *args, **kw)
        self.embedding_layer_3 = LevitConvEmbeddings(c0 // 4, c0 // 2, *args, **kw)
        self.embedding_layer_4 = LevitConvEmbeddings(c0 // 2, c0, *args, **kw)

    def __call__(self, params, pixel_values):
        x = pixel_values
        x = jax.nn.hard_swish(self.embedding_layer_1(params["embedding_layer_1"], x))
        x = jax.nn.hard_swish(self.embedding_layer_2(params["embedding_layer_2"], x))
        x = jax.nn.hard_swish(self.embedding_layer_3(params["embedding_layer_3"], x))
        x = self.embedding_layer_4(params["embedding_layer_4"], x)
        b, c = x.shape[0], x.shape[1]
        return x.reshape(b, c, -1).transpose(0, 2, 1)


def _bias_indices(points_q, points_k, stride=1):
    """Relative-offset dedup table (reference modeling_levit.py:168/241)."""
    offsets, indices = {}, []
    for p1 in points_q:
        for p2 in points_k:
            offset = (abs(p1[0] * stride - p2[0]), abs(p1[1] * stride - p2[1]))
            if offset not in offsets:
                offsets[offset] = len(offsets)
            indices.append(offsets[offset])
    idx = np.asarray(indices, np.int32).reshape(len(points_q), len(points_k))
    return idx, len(offsets)


class LevitAttention(Module):
    """Fused qkv projection + learned per-offset attention biases
    (reference modeling_levit.py:151)."""

    def __init__(self, hidden_sizes, key_dim, num_heads, attention_ratio,
                 resolution, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.num_heads = num_heads
        self.key_dim = key_dim
        self.attention_ratio = attention_ratio
        self.scale = key_dim ** -0.5
        out_kv = attention_ratio * key_dim * num_heads + key_dim * num_heads * 2
        self.out_dim_projection = attention_ratio * key_dim * num_heads
        self.queries_keys_values = MLPLayerWithBN(hidden_sizes, out_kv, **kw)
        self.projection = MLPLayerWithBN(self.out_dim_projection, hidden_sizes, **kw)
        points = list(itertools.product(range(resolution), range(resolution)))
        self.bias_idxs, self.num_offsets = _bias_indices(points, points)

    def init(self, rng):
        params = super().init(rng)
        params["attention_biases"] = jnp.zeros(
            (self.num_heads, self.num_offsets), self.param_dtype)
        return params

    def __call__(self, params, x):
        b, s, _ = x.shape
        qkv = self.queries_keys_values(params["queries_keys_values"], x)
        qkv = qkv.reshape(b, s, self.num_heads, -1)
        q = qkv[..., : self.key_dim]
        k = qkv[..., self.key_dim: 2 * self.key_dim]
        v = qkv[..., 2 * self.key_dim:]
        bias = params["attention_biases"].astype(x.dtype)[:, self.bias_idxs]
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) * self.scale + bias
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
        out = out.reshape(b, s, self.out_dim_projection)
        return self.projection(params["projection"], jax.nn.hard_swish(out))


class LevitAttentionSubsample(Module):
    """Stride-2 downsampling attention: queries from a subsampled grid attend
    to the full-resolution keys/values (reference modeling_levit.py:213)."""

    def __init__(self, input_dim, output_dim, key_dim, num_heads,
                 attention_ratio, stride, resolution_in, resolution_out, *,
                 dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.num_heads = num_heads
        self.key_dim = key_dim
        self.attention_ratio = attention_ratio
        self.scale = key_dim ** -0.5
        self.stride = stride
        self.resolution_in = resolution_in
        self.resolution_out = resolution_out
        out_kv = attention_ratio * key_dim * num_heads + key_dim * num_heads
        self.out_dim_projection = attention_ratio * key_dim * num_heads
        self.keys_values = MLPLayerWithBN(input_dim, out_kv, **kw)
        self.queries = MLPLayerWithBN(input_dim, key_dim * num_heads, **kw)
        self.projection = MLPLayerWithBN(self.out_dim_projection, output_dim, **kw)
        points = list(itertools.product(range(resolution_in), range(resolution_in)))
        points_ = list(itertools.product(range(resolution_out), range(resolution_out)))
        self.bias_idxs, self.num_offsets = _bias_indices(points_, points, stride)

    def init(self, rng):
        params = super().init(rng)
        params["attention_biases"] = jnp.zeros(
            (self.num_heads, self.num_offsets), self.param_dtype)
        return params

    def __call__(self, params, x):
        b, s, c = x.shape
        kv = self.keys_values(params["keys_values"], x)
        kv = kv.reshape(b, s, self.num_heads, -1)
        k = kv[..., : self.key_dim]
        v = kv[..., self.key_dim:]
        r = self.resolution_in
        sub = x.reshape(b, r, r, c)[:, :: self.stride, :: self.stride]
        sub = sub.reshape(b, -1, c)
        q = self.queries(params["queries"], sub)
        q = q.reshape(b, self.resolution_out ** 2, self.num_heads, self.key_dim)
        bias = params["attention_biases"].astype(x.dtype)[:, self.bias_idxs]
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) * self.scale + bias
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
        out = out.reshape(b, -1, self.out_dim_projection)
        return self.projection(params["projection"], jax.nn.hard_swish(out))


class LevitMLPLayer(Module):
    """2x-expansion MLP with BN projections (reference modeling_levit.py:297)."""

    def __init__(self, input_dim, hidden_dim, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.linear_up = MLPLayerWithBN(input_dim, hidden_dim, **kw)
        self.linear_down = MLPLayerWithBN(hidden_dim, input_dim, **kw)

    def __call__(self, params, x):
        return self.linear_down(
            params["linear_down"],
            jax.nn.hard_swish(self.linear_up(params["linear_up"], x)))


class _Residual(Module):
    """x + module(x); checkpoint key ``module`` (reference modeling_levit.py:315).
    drop_path is inference-identity."""

    def __init__(self, module, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.module = module

    def __call__(self, params, x):
        return x + self.module(params["module"], x)


class LevitStage(Module):
    """(attention, MLP) x depth, then an optional subsample attention + MLP
    (reference modeling_levit.py:336)."""

    def __init__(self, config: LevitConfig, idx, resolution_in, *, dtype,
                 param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        hidden = config.hidden_sizes[idx]
        layers = []
        for _ in range(config.depths[idx]):
            layers.append(_Residual(LevitAttention(
                hidden, config.key_dim[idx], config.num_attention_heads[idx],
                config.attention_ratio[idx], resolution_in, **kw), **kw))
            if config.mlp_ratio[idx] > 0:
                layers.append(_Residual(LevitMLPLayer(
                    hidden, hidden * config.mlp_ratio[idx], **kw), **kw))
        self.resolution_out = resolution_in
        down = config.down_ops[idx] if idx < len(config.down_ops) else [""]
        if down and down[0] == "Subsample":
            self.resolution_out = (resolution_in - 1) // down[5] + 1
            layers.append(LevitAttentionSubsample(
                config.hidden_sizes[idx], config.hidden_sizes[idx + 1],
                key_dim=down[1], num_heads=down[2], attention_ratio=down[3],
                stride=down[5], resolution_in=resolution_in,
                resolution_out=self.resolution_out, **kw))
            if down[4] > 0:
                layers.append(_Residual(LevitMLPLayer(
                    config.hidden_sizes[idx + 1],
                    config.hidden_sizes[idx + 1] * down[4], **kw), **kw))
        self.layers = layers

    def __call__(self, params, x):
        for i, layer in enumerate(self.layers):
            x = layer(params["layers"][str(i)], x)
        return x


class LevitEncoder(Module):
    def __init__(self, config: LevitConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        resolution = config.image_size // config.patch_size
        stages = []
        for idx in range(len(config.depths)):
            stage = LevitStage(config, idx, resolution, dtype=dtype,
                               param_dtype=param_dtype)
            resolution = stage.resolution_out
            stages.append(stage)
        self.stages = stages

    def __call__(self, params, x, output_hidden_states=False):
        all_hidden = [] if output_hidden_states else None
        for i, stage in enumerate(self.stages):
            if output_hidden_states:
                all_hidden.append(x)
            x = stage(params["stages"][str(i)], x)
        if output_hidden_states:
            all_hidden.append(x)
        return x, all_hidden


class LevitModel(Module):
    def __init__(self, config: LevitConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.patch_embeddings = LevitPatchEmbeddings(config, **kw)
        self.encoder = LevitEncoder(config, **kw)

    def __call__(self, params, pixel_values, output_hidden_states=False,
                 **kwargs):
        emb = self.patch_embeddings(params["patch_embeddings"],
                                    jnp.asarray(pixel_values, self.dtype))
        x, all_hidden = self.encoder(params["encoder"], emb,
                                     output_hidden_states)
        return LevitModelOutput(
            last_hidden_state=x,
            pooler_output=x.mean(axis=1),
            hidden_states=tuple(all_hidden) if all_hidden is not None else None)


class LevitClassificationLayer(Module):
    """BN over pooled features + Linear (reference modeling_levit.py:451)."""

    def __init__(self, input_dim, output_dim, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.batch_norm = _BN1d(input_dim, **kw)
        self.linear = Linear(input_dim, output_dim, True, **kw)

    def __call__(self, params, x):
        return self.linear(params["linear"],
                           self.batch_norm(params["batch_norm"], x))


class LevitPreTrainedModel(PreTrainedModel):
    config_class = LevitConfig
    base_model_prefix = "levit"
    main_input_name = "pixel_values"
    _keys_to_ignore_on_load_unexpected = (r"num_batches_tracked$",)


class LevitModelStandalone(LevitPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.patch_embeddings = LevitPatchEmbeddings(
            config, dtype=self.dtype, param_dtype=self.param_dtype)
        self.encoder = LevitEncoder(config, dtype=self.dtype,
                                    param_dtype=self.param_dtype)

    def __call__(self, params, pixel_values=None, output_hidden_states=False,
                 **kwargs):
        emb = self.patch_embeddings(params["patch_embeddings"],
                                    jnp.asarray(pixel_values, self.dtype))
        x, all_hidden = self.encoder(params["encoder"], emb,
                                     output_hidden_states)
        return LevitModelOutput(
            last_hidden_state=x,
            pooler_output=x.mean(axis=1),
            hidden_states=tuple(all_hidden) if all_hidden is not None else None)


class LevitForImageClassification(LevitPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.levit = LevitModel(config, **kw)
        if config.num_labels > 0:
            self.classifier = LevitClassificationLayer(
                config.hidden_sizes[-1], config.num_labels, **kw)

    def __call__(self, params, pixel_values=None, labels=None, **kwargs):
        out = self.levit(params["levit"], pixel_values)
        logits = self.classifier(params["classifier"],
                                 out.last_hidden_state.mean(axis=1))
        loss = None
        if labels is not None:
            from ...loss import for_sequence_classification_loss

            loss = for_sequence_classification_loss(logits, labels, self.config)
        return SequenceClassifierOutput(loss=loss, logits=logits)


class LevitForImageClassificationWithTeacher(LevitPreTrainedModel):
    """Inference-only distillation head: final logits are the mean of the
    class and distillation heads (reference modeling_levit.py:~620)."""

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.levit = LevitModel(config, **kw)
        if config.num_labels > 0:
            self.classifier = LevitClassificationLayer(
                config.hidden_sizes[-1], config.num_labels, **kw)
            self.classifier_distill = LevitClassificationLayer(
                config.hidden_sizes[-1], config.num_labels, **kw)

    def __call__(self, params, pixel_values=None, **kwargs):
        out = self.levit(params["levit"], pixel_values)
        pooled = out.last_hidden_state.mean(axis=1)
        cls_logits = self.classifier(params["classifier"], pooled)
        dist_logits = self.classifier_distill(params["classifier_distill"],
                                              pooled)
        return LevitTeacherOutput(logits=(cls_logits + dist_logits) / 2,
                                  cls_logits=cls_logits,
                                  distillation_logits=dist_logits)
