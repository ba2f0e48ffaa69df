"""MobileViTV2, TPU-native (reference
src/transformers/models/mobilevitv2/modeling_mobilevitv2.py).

V2 replaces MobileViT's per-patch ViT with *separable linear self-attention*
(:195-255): a 1x1 conv projects to [1 query-score | key | value] channels,
softmax over the patch axis turns the score channel into mixing weights, and
the context vector broadcasts back over relu(value) — O(N) instead of O(N^2),
all dense convs/elementwise so XLA fuses the whole block.  Stages mirror the
reference channel plan (:483-546); norms are GroupNorm(1) ("LayerNorm2D").
Unfold/fold are pure static reshapes (kernel == stride == patch_size).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax.numpy as jnp

from ...core.module import GroupNorm, Linear, Module
from ...modeling_utils import PreTrainedModel
from ...utils.generic import ModelOutput
from ..mobilenet_v2.modeling_mobilenet_v2 import make_divisible
from ..mobilevit.modeling_mobilevit import (MobileViTConvLayer,
                                            MobileViTInvertedResidual,
                                            MobileViTMobileNetLayer)
from .configuration_mobilevitv2 import MobileViTV2Config


def _clip(value, min_val, max_val):
    return max(min_val, min(max_val, value))


@dataclass
class MobileViTV2ModelOutput(ModelOutput):
    last_hidden_state: Any = None
    pooler_output: Any = None
    hidden_states: Any = None
    logits: Any = None
    loss: Any = None


class MobileViTV2LinearSelfAttention(Module):
    """Separable self-attention (reference :195-255). Input layout
    [B, C, P, N] (P = pixels per patch, N = patches)."""

    def __init__(self, config, embed_dim, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embed_dim = embed_dim
        self.qkv_proj = MobileViTConvLayer(config, embed_dim, 1 + 2 * embed_dim,
                                           1, bias=True, use_normalization=False,
                                           use_activation=False, **kw)
        self.out_proj = MobileViTConvLayer(config, embed_dim, embed_dim, 1,
                                           bias=True, use_normalization=False,
                                           use_activation=False, **kw)

    def __call__(self, params, x):
        qkv = self.qkv_proj(params["qkv_proj"], x)
        query = qkv[:, :1]
        key = qkv[:, 1:1 + self.embed_dim]
        value = qkv[:, 1 + self.embed_dim:]
        context_scores = jnp.exp(query - jnp.max(query, axis=-1, keepdims=True))
        context_scores = context_scores / jnp.sum(context_scores, axis=-1, keepdims=True)
        context = jnp.sum(key * context_scores, axis=-1, keepdims=True)
        out = jnp.maximum(value, 0.0) * context
        return self.out_proj(params["out_proj"], out)


class MobileViTV2FFN(Module):
    def __init__(self, config, embed_dim, ffn_dim, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.conv1 = MobileViTConvLayer(config, embed_dim, ffn_dim, 1, bias=True,
                                        use_normalization=False,
                                        use_activation=True, **kw)
        self.conv2 = MobileViTConvLayer(config, ffn_dim, embed_dim, 1, bias=True,
                                        use_normalization=False,
                                        use_activation=False, **kw)

    def __call__(self, params, x):
        return self.conv2(params["conv2"], self.conv1(params["conv1"], x))


class MobileViTV2TransformerLayer(Module):
    def __init__(self, config, embed_dim, ffn_dim, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.layernorm_before = GroupNorm(1, embed_dim, config.layer_norm_eps, **kw)
        self.attention = MobileViTV2LinearSelfAttention(config, embed_dim, **kw)
        self.layernorm_after = GroupNorm(1, embed_dim, config.layer_norm_eps, **kw)
        self.ffn = MobileViTV2FFN(config, embed_dim, ffn_dim, **kw)

    def __call__(self, params, x):
        h = self.layernorm_before(params["layernorm_before"], x)
        x = x + self.attention(params["attention"], h)
        h = self.layernorm_after(params["layernorm_after"], x)
        return x + self.ffn(params["ffn"], h)


class MobileViTV2Layer(Module):
    """Downsample → local convs → unfold → linear-attn transformer → fold →
    project (reference :350-462; note: no fusion conv in V2)."""

    def __init__(self, config, in_ch, out_ch, attn_unit_dim, n_attn_blocks,
                 dilation=1, stride=2, *, dtype, param_dtype):
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
                                           config.conv_kernel_size,
                                           groups=in_ch, **kw)
        self.conv_1x1 = MobileViTConvLayer(config, in_ch, attn_unit_dim, 1,
                                           use_normalization=False,
                                           use_activation=False, **kw)
        ffn_dim = int((config.ffn_multiplier * attn_unit_dim) // 16 * 16)
        transformer = Module(**kw)
        transformer.layer = [MobileViTV2TransformerLayer(config, attn_unit_dim,
                                                         ffn_dim, **kw)
                             for _ in range(n_attn_blocks)]
        self.transformer = transformer
        self.layernorm = GroupNorm(1, attn_unit_dim, config.layer_norm_eps, **kw)
        self.conv_projection = MobileViTConvLayer(config, attn_unit_dim, in_ch, 1,
                                                  use_normalization=True,
                                                  use_activation=False, **kw)

    def unfold(self, x):
        p = self.patch
        b, c, h, w = x.shape
        nbh, nbw = h // p, w // p
        # [B,C,H,W] -> [B,C,P*P,N] matching torch unfold(kernel=stride=p)
        x = x.reshape(b, c, nbh, p, nbw, p)
        x = x.transpose(0, 1, 3, 5, 2, 4)
        return x.reshape(b, c, p * p, nbh * nbw), (nbh, nbw)

    def fold(self, patches, grid):
        p = self.patch
        nbh, nbw = grid
        b, c, _, _ = patches.shape
        x = patches.reshape(b, c, p, p, nbh, nbw)
        x = x.transpose(0, 1, 4, 2, 5, 3)
        return x.reshape(b, c, nbh * p, nbw * p)

    def __call__(self, params, x):
        if self.has_down:
            x = self.downsampling_layer(params["downsampling_layer"], x)
        h = self.conv_kxk(params["conv_kxk"], x)
        h = self.conv_1x1(params["conv_1x1"], h)
        patches, grid = self.unfold(h)
        for i, layer in enumerate(self.transformer.layer):
            patches = layer(params["transformer"]["layer"][str(i)], patches)
        patches = self.layernorm(params["layernorm"], patches)
        h = self.fold(patches, grid)
        return self.conv_projection(params["conv_projection"], h)


class MobileViTV2Encoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        wm = config.width_multiplier
        dilate4 = config.output_stride == 8
        dilate5 = config.output_stride in (8, 16)
        dims = [make_divisible(_clip(32 * wm, 16, 64), 8, 16),
                make_divisible(64 * wm, 16), make_divisible(128 * wm, 8),
                make_divisible(256 * wm, 8), make_divisible(384 * wm, 8),
                make_divisible(512 * wm, 8)]
        dilation = 1
        layers = [MobileViTMobileNetLayer(config, dims[0], dims[1], stride=1,
                                          num_stages=1, **kw),
                  MobileViTMobileNetLayer(config, dims[1], dims[2], stride=2,
                                          num_stages=2, **kw),
                  MobileViTV2Layer(config, dims[2], dims[3],
                                   make_divisible(config.base_attn_unit_dims[0] * wm, 8),
                                   config.n_attn_blocks[0], **kw)]
        if dilate4:
            dilation *= 2
        layers.append(MobileViTV2Layer(config, dims[3], dims[4],
                                       make_divisible(config.base_attn_unit_dims[1] * wm, 8),
                                       config.n_attn_blocks[1], dilation, **kw))
        if dilate5:
            dilation *= 2
        layers.append(MobileViTV2Layer(config, dims[4], dims[5],
                                       make_divisible(config.base_attn_unit_dims[2] * wm, 8),
                                       config.n_attn_blocks[2], dilation, **kw))
        self.layer = layers

    def __call__(self, params, x, output_hidden_states=False):
        all_hidden = [] if output_hidden_states else None
        for i, layer in enumerate(self.layer):
            x = layer(params["layer"][str(i)], x)
            if output_hidden_states:
                all_hidden.append(x)
        return x, all_hidden


class MobileViTV2Model(Module):
    def __init__(self, config, *, dtype, param_dtype, expand_output=True):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.expand_output = expand_output
        layer_0_dim = make_divisible(_clip(32 * config.width_multiplier, 16, 64), 8, 16)
        self.conv_stem = MobileViTConvLayer(config, config.num_channels,
                                            layer_0_dim, 3, stride=2, **kw)
        self.encoder = MobileViTV2Encoder(config, **kw)

    def __call__(self, params, pixel_values, output_hidden_states=False):
        h = self.conv_stem(params["conv_stem"], pixel_values)
        h, all_hidden = self.encoder(params["encoder"], h, output_hidden_states)
        pooled = jnp.mean(h, axis=(-2, -1)) if self.expand_output else None
        return MobileViTV2ModelOutput(
            last_hidden_state=h, pooler_output=pooled,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None)


class MobileViTV2PreTrainedModel(PreTrainedModel):
    config_class = MobileViTV2Config
    base_model_prefix = "mobilevitv2"
    main_input_name = "pixel_values"


class MobileViTV2ModelStandalone(MobileViTV2PreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.mobilevitv2 = MobileViTV2Model(config, dtype=self.dtype,
                                            param_dtype=self.param_dtype)

    def __call__(self, params, pixel_values, **kwargs):
        return self.mobilevitv2(params["mobilevitv2"], pixel_values, **kwargs)


class MobileViTV2ForImageClassification(MobileViTV2PreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.mobilevitv2 = MobileViTV2Model(config, **kw)
        out_ch = make_divisible(512 * config.width_multiplier, 8)
        self.classifier = Linear(out_ch, config.num_labels, True, **kw)

    def __call__(self, params, pixel_values, labels=None, **kwargs):
        out = self.mobilevitv2(params["mobilevitv2"], pixel_values)
        logits = self.classifier(params["classifier"], out.pooler_output)
        loss = None
        if labels is not None:
            from ...loss import cross_entropy
            loss = cross_entropy(logits, labels)
        return MobileViTV2ModelOutput(loss=loss, logits=logits,
                                      hidden_states=out.hidden_states)
