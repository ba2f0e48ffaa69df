"""Swin Transformer V2, TPU-native (reference
src/transformers/models/swinv2/modeling_swinv2.py).

Swin with the V2 changes: cosine attention with a learned clamped logit
scale, log-spaced continuous relative position bias from a 2-layer MLP
(16·sigmoid), post-norm residual blocks, and patch merging that reduces
before normalizing.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ...core.loading import WeightRule
from ...core.module import LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import BaseModelOutputWithPooling, SequenceClassifierOutput
from ...modeling_utils import PreTrainedModel
from ..swin.modeling_swin import (SwinEmbeddings, SwinMLP, SwinModel,
                                  shift_attn_mask, window_partition,
                                  window_reverse)
from .configuration_swinv2 import Swinv2Config


def _log_coords_table(ws: int, pretrained_ws: int) -> np.ndarray:
    """[1, 2ws-1, 2ws-1, 2] log-spaced relative coordinates
    (reference create_coords_table_and_index)."""
    rel = np.arange(-(ws - 1), ws, dtype=np.float64)
    table = np.stack(np.meshgrid(rel, rel, indexing="ij"), axis=-1)[None]
    denom = (pretrained_ws - 1) if pretrained_ws > 0 else (ws - 1 if ws > 1 else 1)
    table = table / denom
    table = table * 8
    table = np.sign(table) * np.log2(np.abs(table) + 1.0) / math.log2(8)
    return table.astype(np.float32)


def _relative_position_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


class Swinv2Attention(Module):
    """Cosine attention + continuous position bias (reference
    Swinv2SelfAttention/Swinv2Attention)."""

    def __init__(self, config, dim, num_heads, ws, pretrained_ws, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.q_proj = Linear(dim, dim, config.qkv_bias, **kw)
        self.k_proj = Linear(dim, dim, False, **kw)
        self.v_proj = Linear(dim, dim, config.qkv_bias, **kw)
        self.o_proj = Linear(dim, dim, True, **kw)
        self.cpb_fc1 = Linear(2, 512, True, **kw)
        self.cpb_fc2 = Linear(512, num_heads, False, **kw)
        self.coords_table = _log_coords_table(ws, pretrained_ws)
        self.bias_index = _relative_position_index(ws).reshape(-1)
        self.ws = ws

    def init(self, rng):
        params = super().init(rng)
        params["logit_scale"] = jnp.full((self.num_heads, 1, 1),
                                         math.log(10.0), self.param_dtype)
        return params

    def position_bias(self, params):
        table = self.cpb_fc2(params["cpb_fc2"], jax.nn.relu(
            self.cpb_fc1(params["cpb_fc1"],
                         jnp.asarray(self.coords_table, self.dtype))))
        table = table.reshape(-1, self.num_heads)
        n = self.ws * self.ws
        bias = jnp.take(table, jnp.asarray(self.bias_index), axis=0)
        bias = bias.reshape(n, n, self.num_heads).transpose(2, 0, 1)
        return (16.0 * jax.nn.sigmoid(bias))[None]       # [1, H, N, N]

    def __call__(self, params, windows, attn_bias):
        bw, n, c = windows.shape
        q = self.q_proj(params["q_proj"], windows).reshape(bw, n, self.num_heads, self.head_dim)
        k = self.k_proj(params["k_proj"], windows).reshape(bw, n, self.num_heads, self.head_dim)
        v = self.v_proj(params["v_proj"], windows).reshape(bw, n, self.num_heads, self.head_dim)
        qn = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
        kn = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12)
        scores = jnp.einsum("bqhd,bkhd->bhqk", qn, kn,
                            preferred_element_type=jnp.float32)
        scale = jnp.exp(jnp.minimum(params["logit_scale"].astype(jnp.float32),
                                    math.log(1.0 / 0.01)))
        scores = scores * scale[None]
        scores = scores + attn_bias
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(bw, n, c)
        return self.o_proj(params["o_proj"], out)


class Swinv2Layer(Module):
    """Post-norm residual block (reference Swinv2Layer)."""

    def __init__(self, config, dim, input_resolution, num_heads, shift_size,
                 pretrained_ws, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        ws = min(min(input_resolution), config.window_size)
        self.window_size = ws
        self.shift_size = 0 if min(input_resolution) <= ws else shift_size
        self.input_resolution = input_resolution
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.attention = Swinv2Attention(config, dim, num_heads, ws,
                                         pretrained_ws, **kw)
        self.layernorm_before = LayerNorm(dim, config.layer_norm_eps, **kw)
        self.layernorm_after = LayerNorm(dim, config.layer_norm_eps, **kw)
        self.mlp = SwinMLP(config, dim, **kw)

    def __call__(self, params, hidden):
        height, width = self.input_resolution
        ws, shift = self.window_size, self.shift_size
        b, _, c = hidden.shape
        shortcut = hidden
        h = hidden.reshape(b, height, width, c)
        pad_r = (ws - width % ws) % ws
        pad_b = (ws - height % ws) % ws
        if pad_r or pad_b:
            h = jnp.pad(h, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = height + pad_b, width + pad_r
        if shift > 0:
            h = jnp.roll(h, shift=(-shift, -shift), axis=(1, 2))
        windows = window_partition(h, ws)
        n = ws * ws
        nw = (hp // ws) * (wp // ws)
        bias = self.attention.position_bias(params["attention"])
        if shift > 0:
            mask = jnp.asarray(shift_attn_mask(hp, wp, ws, shift))
            bias = bias[:, None] + mask[None, :, None]
        else:
            bias = bias[:, None]
        bias = jnp.broadcast_to(bias, (b, nw, self.attention.num_heads, n, n))
        bias = bias.reshape(b * nw, self.attention.num_heads, n, n)
        attn = self.attention(params["attention"], windows, bias)
        attn = window_reverse(attn, ws, hp, wp)
        if shift > 0:
            attn = jnp.roll(attn, shift=(shift, shift), axis=(1, 2))
        if pad_r or pad_b:
            attn = attn[:, :height, :width]
        attn = attn.reshape(b, height * width, c)
        hidden = shortcut + self.layernorm_before(params["layernorm_before"], attn)
        mlp = self.mlp(params["mlp"], hidden)
        return hidden + self.layernorm_after(params["layernorm_after"], mlp)


class Swinv2PatchMerging(Module):
    """reduction THEN norm (reference Swinv2PatchMerging)."""

    def __init__(self, dim, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.reduction = Linear(4 * dim, 2 * dim, False, **kw)
        self.norm = LayerNorm(2 * dim, 1e-5, **kw)

    def __call__(self, params, x, dims):
        height, width = dims
        b, _, c = x.shape
        x = x.reshape(b, height, width, c)
        if height % 2 or width % 2:
            x = jnp.pad(x, ((0, 0), (0, height % 2), (0, width % 2), (0, 0)))
        x = jnp.concatenate(
            [x[:, row::2, col::2, :] for col in range(2) for row in range(2)], axis=-1)
        x = x.reshape(b, -1, 4 * c)
        return self.norm(params["norm"], self.reduction(params["reduction"], x))


class Swinv2Stage(Module):
    def __init__(self, config, dim, input_resolution, depth, num_heads,
                 has_downsample, pretrained_ws, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.blocks = [
            Swinv2Layer(config, dim, input_resolution, num_heads,
                        0 if i % 2 == 0 else config.window_size // 2,
                        pretrained_ws, **kw)
            for i in range(depth)]
        self.input_resolution = input_resolution
        self.downsample = Swinv2PatchMerging(dim, **kw) if has_downsample else None

    def __call__(self, params, hidden):
        for i, block in enumerate(self.blocks):
            hidden = block(params["blocks"][str(i)], hidden)
        if self.downsample is not None:
            hidden = self.downsample(params["downsample"], hidden,
                                     self.input_resolution)
        return hidden


class Swinv2Encoder(Module):
    def __init__(self, config, grid, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        n = len(config.depths)
        pws = getattr(config, "pretrained_window_sizes", [0] * n)
        self.layers = [
            Swinv2Stage(config, int(config.embed_dim * 2**i),
                        (grid[0] // (2**i), grid[1] // (2**i)),
                        config.depths[i], config.num_heads[i], i < n - 1,
                        pws[i], **kw)
            for i in range(n)]

    def __call__(self, params, hidden, output_hidden_states=False):
        all_hidden = [hidden] if output_hidden_states else None
        for i, stage in enumerate(self.layers):
            hidden = stage(params["layers"][str(i)], hidden)
            if output_hidden_states:
                all_hidden.append(hidden)
        return hidden, all_hidden


SWINV2_WEIGHT_RULES = (
    WeightRule(pattern=r"(.*)\.attention\.self\.query\.(.*)", rename=r"\1.attention.q_proj.\2"),
    WeightRule(pattern=r"(.*)\.attention\.self\.key\.(.*)", rename=r"\1.attention.k_proj.\2"),
    WeightRule(pattern=r"(.*)\.attention\.self\.value\.(.*)", rename=r"\1.attention.v_proj.\2"),
    WeightRule(pattern=r"(.*)\.attention\.self\.logit_scale$", rename=r"\1.attention.logit_scale"),
    WeightRule(pattern=r"(.*)\.attention\.self\.continuous_position_bias_mlp\.0\.(.*)",
               rename=r"\1.attention.cpb_fc1.\2"),
    WeightRule(pattern=r"(.*)\.attention\.self\.continuous_position_bias_mlp\.2\.(.*)",
               rename=r"\1.attention.cpb_fc2.\2"),
    WeightRule(pattern=r"(.*)\.attention\.output\.dense\.(.*)", rename=r"\1.attention.o_proj.\2"),
    WeightRule(pattern=r"(.*)\.intermediate\.dense\.(.*)", rename=r"\1.mlp.fc1.\2"),
    WeightRule(pattern=r"(.*blocks\.\d+)\.output\.dense\.(.*)", rename=r"\1.mlp.fc2.\2"),
)


class Swinv2Model(SwinModel):
    def __init__(self, config: Swinv2Config, *, dtype, param_dtype,
                 add_pooling_layer=True):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype,
                         add_pooling_layer=add_pooling_layer)
        g = config.image_size // config.patch_size
        self.encoder = Swinv2Encoder(config, (g, g), dtype=dtype,
                                     param_dtype=param_dtype)


class Swinv2PreTrainedModel(PreTrainedModel):
    config_class = Swinv2Config
    base_model_prefix = "swinv2"
    main_input_name = "pixel_values"
    _weight_rules = SWINV2_WEIGHT_RULES
    _keys_to_ignore_on_load_unexpected = (
        r"relative_position_index$", r"relative_coords_table$")


class Swinv2ModelStandalone(Swinv2PreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.swinv2 = Swinv2Model(config, dtype=self.dtype,
                                  param_dtype=self.param_dtype)

    def __call__(self, params, pixel_values=None, **kwargs):
        return self.swinv2(params["swinv2"], pixel_values, **kwargs)


class Swinv2ForImageClassification(Swinv2PreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.swinv2 = Swinv2Model(config, **kw)
        num_features = int(config.embed_dim * 2 ** (len(config.depths) - 1))
        self.classifier = Linear(num_features, config.num_labels, True,
                                 kernel_init=normal_init(config.initializer_range),
                                 **kw)

    def __call__(self, params, pixel_values=None, labels=None, **kwargs):
        out = self.swinv2(params["swinv2"], pixel_values)
        logits = self.classifier(params["classifier"], out.pooler_output)
        loss = None
        if labels is not None:
            from ...loss import for_sequence_classification_loss

            loss = for_sequence_classification_loss(logits, labels, self.config)
        return SequenceClassifierOutput(loss=loss, logits=logits)
