"""SAM2 (image path), TPU-native (reference models/sam2/modeling_sam2.py).

- Vision: **Hiera** multi-scale backbone (:580 Sam2HieraDetModel) — windowed
  attention stages with query max-pooling between stages and a handful of
  global blocks — feeding an FPN neck (:195) of 1x1 convs with nearest 2x
  top-down fusion and sine position encodings.
- Prompt encoder (:751): random-Fourier point/box embeddings + conv mask
  embedding, positional table shared (tied) with the image-wide encoding.
- Mask decoder (:1068): two-way transformer with an **object-score token**
  ahead of the iou/mask tokens, transposed-conv upscaling with two
  high-resolution FPN skip connections, and dynamic single-mask fallback by
  stability score (:1233).

The video/memory machinery (memory attention/encoder) belongs to
Sam2VideoModel in the reference and is out of scope here; its checkpoint
keys are accepted and ignored (``memory_*`` etc.).

Static shapes: window layout, pooling strides, and interpolation weight
matrices are host-computed from config geometry; everything else is jittable.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core.module import Embedding, LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import ModelOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...ops.attention import eager_attention
from ..sam.modeling_sam import ConvTranspose2d, SamChannelsFirstLayerNorm
from .configuration_sam2 import (Sam2Config, Sam2HieraDetConfig,
                                 Sam2MaskDecoderConfig, Sam2PromptEncoderConfig,
                                 Sam2VisionConfig)


@dataclass
class Sam2ImageSegmentationOutput(ModelOutput):
    iou_scores: Optional[jnp.ndarray] = None
    pred_masks: Optional[jnp.ndarray] = None
    object_score_logits: Optional[jnp.ndarray] = None
    image_embeddings: Optional[tuple] = None


def _cubic_taps(t, A=-0.75):
    w0 = ((A * (t + 1) - 5 * A) * (t + 1) + 8 * A) * (t + 1) - 4 * A
    w1 = ((A + 2) * t - (A + 3)) * t * t + 1
    w2 = ((A + 2) * (1 - t) - (A + 3)) * (1 - t) * (1 - t) + 1
    return np.stack([w0, w1, w2, 1.0 - w0 - w1 - w2], axis=-1)


def bicubic_resize_matrix(src: int, dst: int) -> np.ndarray:
    """[dst, src] weights matching torch F.interpolate(mode='bicubic',
    align_corners=False) with edge clamping."""
    x = (np.arange(dst) + 0.5) * (src / dst) - 0.5
    x0 = np.floor(x)
    w = _cubic_taps(x - x0)  # [dst, 4]
    m = np.zeros((dst, src))
    for k in range(4):
        idx = np.clip(x0 + k - 1, 0, src - 1).astype(int)
        np.add.at(m, (np.arange(dst), idx), w[:, k])
    return m


def conv2d(x, weight, bias=None, stride=(1, 1), padding=(0, 0)):
    """NCHW conv via lax (weight [O, I, Kh, Kw])."""
    y = jax.lax.conv_general_dilated(
        x, weight, window_strides=tuple(stride),
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    if bias is not None:
        y = y + bias[None, :, None, None]
    return y


def max_pool2d(x_bhwc, k: int):
    """ceil_mode=False max pool over [B, H, W, C]."""
    return jax.lax.reduce_window(
        x_bhwc, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, k, k, 1), "VALID")


def window_partition(x, win):
    b, h, w, c = x.shape
    ph, pw = (win - h % win) % win, (win - w % win) % win
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hp, wp = h + ph, w + pw
    x = x.reshape(b, hp // win, win, wp // win, win, c)
    return (x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, win, win, c), (hp, wp))


def window_unpartition(windows, win, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    b = windows.shape[0] // ((hp // win) * (wp // win))
    x = windows.reshape(b, hp // win, wp // win, win, win, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


def sine_position_embedding(h, w, num_pos_feats, dtype=jnp.float32):
    """Normalized sine embedding (reference Sam2SinePositionEmbedding :149)."""
    scale = 2 * math.pi
    y_embed = jnp.broadcast_to(jnp.arange(1, h + 1, dtype=jnp.float32)[:, None], (h, w))
    x_embed = jnp.broadcast_to(jnp.arange(1, w + 1, dtype=jnp.float32)[None, :], (h, w))
    y_embed = y_embed / (h + 1e-6) * scale
    x_embed = x_embed / (w + 1e-6) * scale
    dim_t = np.arange(num_pos_feats, dtype=np.float64)
    dim_t = 10000.0 ** (2 * np.floor(dim_t / 2) / num_pos_feats)
    dim_t = jnp.asarray(dim_t, jnp.float32)
    pos_x = x_embed[:, :, None] / dim_t
    pos_y = y_embed[:, :, None] / dim_t
    px = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])], -1).reshape(h, w, -1)
    py = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])], -1).reshape(h, w, -1)
    return jnp.concatenate([py, px], axis=-1).transpose(2, 0, 1)[None].astype(dtype)  # [1,C,H,W]


# ------------------------------------------------------------------ backbone
class Sam2FeedForward(Module):
    """proj_in -> act -> (hidden layers) -> proj_out (reference :344)."""

    def __init__(self, input_dim, hidden_dim, output_dim, num_layers,
                 activation="relu", sigmoid_output=False, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.02))
        self.proj_in = Linear(input_dim, hidden_dim, True, **kw)
        self.proj_out = Linear(hidden_dim, output_dim, True, **kw)
        self.layers = [Linear(hidden_dim, hidden_dim, True, **kw)
                       for _ in range(num_layers - 2)]
        self.act = get_activation(activation)
        self.sigmoid_output = sigmoid_output

    def __call__(self, params, x):
        h = self.act(self.proj_in(params["proj_in"], x))
        for i, layer in enumerate(self.layers):
            h = self.act(layer(params["layers"][str(i)], h))
        h = self.proj_out(params["proj_out"], h)
        return jax.nn.sigmoid(h) if self.sigmoid_output else h


class Sam2MultiScaleAttention(Module):
    def __init__(self, config, dim, dim_out, num_heads, query_stride, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.num_heads = num_heads
        self.head_dim = dim_out // num_heads
        self.query_stride = query_stride
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.02))
        self.qkv = Linear(dim, dim_out * 3, True, **kw)
        self.proj = Linear(dim_out, dim_out, True, **kw)

    def __call__(self, params, hidden):  # [B, H, W, C]
        b, h, w, _ = hidden.shape
        qkv = self.qkv(params["qkv"], hidden).reshape(b, h * w, 3, self.num_heads, self.head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        if self.query_stride is not None:
            s = self.query_stride[0]
            q = max_pool2d(q.reshape(b, h, w, -1), s)
            h, w = q.shape[1:3]
            q = q.reshape(b, h * w, self.num_heads, self.head_dim)
        out = eager_attention(q, k, v, is_causal=False, scale=self.head_dim**-0.5)
        out = out.reshape(b, h, w, -1)
        return self.proj(params["proj"], out)


class Sam2MultiScaleBlock(Module):
    def __init__(self, config: Sam2HieraDetConfig, stage_idx, block_idx, total_block_idx,
                 *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.dim = (config.embed_dim_per_stage[stage_idx - 1]
                    if stage_idx > 0 and block_idx == 0
                    else config.embed_dim_per_stage[stage_idx])
        self.dim_out = config.embed_dim_per_stage[stage_idx]
        self.layer_norm1 = LayerNorm(self.dim, config.layer_norm_eps, **kw)
        self.window_size = (config.window_size_per_stage[stage_idx - 1]
                            if stage_idx > 0 and block_idx == 0
                            else config.window_size_per_stage[stage_idx])
        if total_block_idx in config.global_attention_blocks:
            self.window_size = 0
        self.query_stride = (tuple(config.query_stride)
                             if 0 < stage_idx <= config.num_query_pool_stages and block_idx == 0
                             else None)
        self.attn = Sam2MultiScaleAttention(
            config, self.dim, self.dim_out,
            config.num_attention_heads_per_stage[stage_idx], self.query_stride, **kw)
        self.layer_norm2 = LayerNorm(self.dim_out, config.layer_norm_eps, **kw)
        self.mlp = Sam2FeedForward(self.dim_out, int(self.dim_out * config.mlp_ratio),
                                   self.dim_out, 2, config.hidden_act, **kw)
        if self.dim != self.dim_out:
            self.proj = Linear(self.dim, self.dim_out, True,
                               kernel_init=normal_init(0.02), **kw)

    def __call__(self, params, hidden):  # [B, H, W, C]
        residual = hidden
        hidden = self.layer_norm1(params["layer_norm1"], hidden)
        if self.dim != self.dim_out:
            residual = self.proj(params["proj"], hidden)
            if self.query_stride:
                residual = max_pool2d(residual, self.query_stride[0])
        win = self.window_size
        if win > 0:
            h0, w0 = hidden.shape[1], hidden.shape[2]
            hidden, pad_hw = window_partition(hidden, win)
        hidden = self.attn(params["attn"], hidden)
        if self.query_stride:
            win = self.window_size // self.query_stride[0]
            h0, w0 = residual.shape[1:3]
            pad_hw = (h0 + (win - h0 % win) % win, w0 + (win - w0 % win) % win)
        if self.window_size > 0:
            hidden = window_unpartition(hidden, win, pad_hw, (h0, w0))
        hidden = residual + hidden
        return hidden + self.mlp(params["mlp"],
                                 self.layer_norm2(params["layer_norm2"], hidden))


class Sam2HieraDetModel(Module):
    """reference :580 — patch embed + windowed pos embed + staged blocks."""

    def __init__(self, config: Sam2HieraDetConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.stage_ends = (np.cumsum(config.blocks_per_stage) - 1).tolist()
        blocks = []
        total = 0
        for stage_idx, nblocks in enumerate(config.blocks_per_stage):
            for block_idx in range(nblocks):
                blocks.append(Sam2MultiScaleBlock(config, stage_idx, block_idx,
                                                  total, **kw))
                total += 1
        self.blocks = blocks

    def init(self, rng):
        params = super().init(rng)
        c = self.config
        k1, _ = jax.random.split(rng)
        params["patch_embed"] = {"projection": {
            "weight": normal_init(c.initializer_range)(
                k1, (c.hidden_size, c.num_channels, *c.patch_kernel_size), self.param_dtype),
            "bias": jnp.zeros((c.hidden_size,), self.param_dtype)}}
        params["pos_embed"] = jnp.zeros(
            (1, c.hidden_size, *c.window_positional_embedding_background_size),
            self.param_dtype)
        params["pos_embed_window"] = jnp.zeros(
            (1, c.hidden_size, c.window_size_per_stage[0], c.window_size_per_stage[0]),
            self.param_dtype)
        return params

    def _pos_embed(self, params, h, w):
        pe = params["pos_embed"].astype(jnp.float32)
        mh = jnp.asarray(bicubic_resize_matrix(pe.shape[2], h), jnp.float32)
        mw = jnp.asarray(bicubic_resize_matrix(pe.shape[3], w), jnp.float32)
        pe = jnp.einsum("hH,bcHW,wW->bchw", mh, pe, mw)
        win = params["pos_embed_window"].astype(jnp.float32)
        tiles = [p // q for p, q in zip(pe.shape, win.shape)]
        pe = pe + jnp.tile(win, tiles)
        return pe.transpose(0, 2, 3, 1).astype(self.dtype)

    def __call__(self, params, pixel_values):
        c = self.config
        emb = conv2d(pixel_values.astype(self.dtype),
                     params["patch_embed"]["projection"]["weight"].astype(self.dtype),
                     params["patch_embed"]["projection"]["bias"].astype(self.dtype),
                     stride=c.patch_stride, padding=c.patch_padding)
        hidden = emb.transpose(0, 2, 3, 1)  # [B, H, W, C]
        hidden = hidden + self._pos_embed(params, hidden.shape[1], hidden.shape[2])
        intermediates = []
        for i, block in enumerate(self.blocks):
            hidden = block(params["blocks"][str(i)], hidden)
            if i in self.stage_ends:
                intermediates.append(hidden)
        return hidden, intermediates


class Sam2VisionModel(Module):
    """Backbone + FPN neck (reference :651)."""

    def __init__(self, config: Sam2VisionConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.backbone = Sam2HieraDetModel(config.backbone_config,
                                          dtype=dtype, param_dtype=param_dtype)

    def init(self, rng):
        params = super().init(rng)
        c = self.config
        keys = jax.random.split(rng, len(c.backbone_channel_list))
        convs = {}
        for i, in_ch in enumerate(c.backbone_channel_list):
            convs[str(i)] = {
                "weight": normal_init(c.initializer_range)(
                    keys[i], (c.fpn_hidden_size, in_ch, c.fpn_kernel_size, c.fpn_kernel_size),
                    self.param_dtype),
                "bias": jnp.zeros((c.fpn_hidden_size,), self.param_dtype)}
        params["neck"] = {"convs": convs}
        return params

    def __call__(self, params, pixel_values):
        c = self.config
        _, intermediates = self.backbone(params["backbone"], pixel_values)
        n = len(params["neck"]["convs"]) - 1
        fpn_states, fpn_pos = [], []
        prev = None
        for i in range(n, -1, -1):
            lateral = intermediates[i].transpose(0, 3, 1, 2)  # NCHW
            conv = params["neck"]["convs"][str(n - i)]
            lateral = conv2d(lateral.astype(self.dtype),
                             conv["weight"].astype(self.dtype),
                             conv["bias"].astype(self.dtype),
                             stride=(c.fpn_stride, c.fpn_stride),
                             padding=(c.fpn_padding, c.fpn_padding))
            if i in c.fpn_top_down_levels and i != n and prev is not None:
                up = jnp.repeat(jnp.repeat(prev.astype(jnp.float32), 2, axis=2),
                                2, axis=3).astype(lateral.dtype)
                prev = lateral + up
            else:
                prev = lateral
            fpn_states.append(prev)
            fpn_pos.append(sine_position_embedding(
                prev.shape[2], prev.shape[3], c.fpn_hidden_size // 2, prev.dtype))
        k = c.num_feature_levels
        return fpn_states[-k:][::-1], fpn_pos[-k:][::-1]


# ------------------------------------------------------------ prompt encoder
class Sam2PositionalEmbedding(Module):
    def __init__(self, config: Sam2PromptEncoderConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.scale = config.scale
        self.hidden_size = config.hidden_size

    def init(self, rng):
        return {"positional_embedding": (
            self.scale * jax.random.normal(rng, (2, self.hidden_size // 2))
        ).astype(self.param_dtype)}

    def __call__(self, params, coords, input_shape=None):
        c = coords.astype(jnp.float32)
        if input_shape is not None:
            c = c.at[..., 0].set(c[..., 0] / input_shape[1])
            c = c.at[..., 1].set(c[..., 1] / input_shape[0])
        c = 2 * c - 1
        c = c @ params["positional_embedding"].astype(jnp.float32)
        c = 2 * np.pi * c
        return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1).astype(self.dtype)


class Sam2MaskEmbedding(Module):
    def __init__(self, config: Sam2PromptEncoderConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        ch = config.mask_input_channels // 4
        self.layer_norm1 = SamChannelsFirstLayerNorm(ch, config.layer_norm_eps, **kw)
        self.layer_norm2 = SamChannelsFirstLayerNorm(config.mask_input_channels,
                                                     config.layer_norm_eps, **kw)
        self.act = get_activation(config.hidden_act)

    def init(self, rng):
        params = super().init(rng)
        c = self.config
        ch = c.mask_input_channels // 4
        k1, k2, k3 = jax.random.split(rng, 3)
        init = normal_init(0.02)
        params["conv1"] = {"weight": init(k1, (ch, 1, 2, 2), self.param_dtype),
                           "bias": jnp.zeros((ch,), self.param_dtype)}
        params["conv2"] = {"weight": init(k2, (c.mask_input_channels, ch, 2, 2), self.param_dtype),
                           "bias": jnp.zeros((c.mask_input_channels,), self.param_dtype)}
        params["conv3"] = {"weight": init(k3, (c.hidden_size, c.mask_input_channels, 1, 1), self.param_dtype),
                           "bias": jnp.zeros((c.hidden_size,), self.param_dtype)}
        return params

    def __call__(self, params, masks):
        h = conv2d(masks.astype(self.dtype), params["conv1"]["weight"].astype(self.dtype),
                   params["conv1"]["bias"].astype(self.dtype), stride=(2, 2))
        h = self.act(self.layer_norm1(params["layer_norm1"], h))
        h = conv2d(h, params["conv2"]["weight"].astype(self.dtype),
                   params["conv2"]["bias"].astype(self.dtype), stride=(2, 2))
        h = self.act(self.layer_norm2(params["layer_norm2"], h))
        return conv2d(h, params["conv3"]["weight"].astype(self.dtype),
                      params["conv3"]["bias"].astype(self.dtype))


class Sam2PromptEncoder(Module):
    def __init__(self, config: Sam2PromptEncoderConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.shared_embedding = Sam2PositionalEmbedding(config, **kw)
        self.mask_embed = Sam2MaskEmbedding(config, **kw)
        self.no_mask_embed = Embedding(1, config.hidden_size,
                                       embedding_init=normal_init(0.02), **kw)
        self.point_embed = Embedding(config.num_point_embeddings, config.hidden_size,
                                     embedding_init=normal_init(0.02), **kw)
        self.not_a_point_embed = Embedding(1, config.hidden_size,
                                           embedding_init=normal_init(0.02), **kw)
        self.image_embedding_size = (config.image_size // config.patch_size,) * 2
        self.input_image_size = config.image_size

    def _embed_points(self, params, points, labels, pad):
        points = points + 0.5
        if pad:
            points = jnp.pad(points, ((0, 0), (0, 0), (0, 1), (0, 0)))
            labels = jnp.pad(labels, ((0, 0), (0, 0), (0, 1)), constant_values=-1)
        emb = self.shared_embedding(params["shared_embedding"], points,
                                    (self.input_image_size, self.input_image_size))
        nap = params["not_a_point_embed"]["weight"].astype(self.dtype)
        emb = jnp.where(labels[..., None] == -1, nap[0], emb)
        emb = jnp.where(labels[..., None] != -10, emb, jnp.zeros_like(emb))
        pe = self.point_embed(params["point_embed"], jnp.clip(labels, 0, None))
        emb = emb + pe * (labels >= 0)[..., None]
        return emb

    def _embed_boxes(self, params, boxes):
        boxes = boxes + 0.5
        coords = boxes.reshape(*boxes.shape[:2], 2, 2)
        coords = jnp.pad(coords, ((0, 0), (0, 0), (0, 1), (0, 0)))
        emb = self.shared_embedding(params["shared_embedding"], coords,
                                    (self.input_image_size, self.input_image_size))
        pw = params["point_embed"]["weight"].astype(self.dtype)
        nap = params["not_a_point_embed"]["weight"].astype(self.dtype)
        emb = emb.at[:, :, 0, :].add(pw[2])
        emb = emb.at[:, :, 1, :].add(pw[3])
        emb = emb.at[:, :, 2, :].set(nap[0])
        return emb

    def __call__(self, params, input_points, input_labels, input_boxes, input_masks):
        sparse = None
        batch_size = 1
        if input_points is not None:
            batch_size = input_points.shape[0]
            sparse = self._embed_points(params, input_points, input_labels,
                                        pad=(input_boxes is None))
        if input_boxes is not None:
            batch_size = input_boxes.shape[0]
            be = self._embed_boxes(params, input_boxes)
            sparse = be if sparse is None else jnp.concatenate([sparse, be], axis=2)
        if input_masks is not None:
            dense = self.mask_embed(params["mask_embed"], input_masks)
        else:
            nm = params["no_mask_embed"]["weight"].astype(self.dtype)
            dense = jnp.broadcast_to(
                nm.reshape(1, -1, 1, 1),
                (batch_size, self.config.hidden_size, *self.image_embedding_size))
        return sparse, dense


# -------------------------------------------------------------- mask decoder
class Sam2Attention(Module):
    def __init__(self, config: Sam2MaskDecoderConfig, downsample_rate=None, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        rate = config.attention_downsample_rate if downsample_rate is None else downsample_rate
        self.internal_dim = config.hidden_size // rate
        self.num_heads = config.num_attention_heads
        self.head_dim = self.internal_dim // self.num_heads
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.02))
        h = config.hidden_size
        self.q_proj = Linear(h, self.internal_dim, True, **kw)
        self.k_proj = Linear(h, self.internal_dim, True, **kw)
        self.v_proj = Linear(h, self.internal_dim, True, **kw)
        self.o_proj = Linear(self.internal_dim, h, True, **kw)

    def __call__(self, params, query, key, value):
        b, p = query.shape[:2]
        shape = (b * p, -1, self.num_heads, self.head_dim)
        q = self.q_proj(params["q_proj"], query).reshape(shape)
        k = self.k_proj(params["k_proj"], key).reshape(shape)
        v = self.v_proj(params["v_proj"], value).reshape(shape)
        out = eager_attention(q, k, v, is_causal=False, scale=self.head_dim**-0.5)
        out = out.reshape(b, p, -1, self.internal_dim)
        return self.o_proj(params["o_proj"], out)


class Sam2TwoWayAttentionBlock(Module):
    def __init__(self, config, skip_first_layer_pe, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.self_attn = Sam2Attention(config, 1, **kw)
        self.layer_norm1 = LayerNorm(config.hidden_size, 1e-5, **kw)
        self.cross_attn_token_to_image = Sam2Attention(config, **kw)
        self.layer_norm2 = LayerNorm(config.hidden_size, 1e-5, **kw)
        self.mlp = Sam2FeedForward(config.hidden_size, config.mlp_dim,
                                   config.hidden_size, config.num_hidden_layers,
                                   "relu", **kw)
        self.layer_norm3 = LayerNorm(config.hidden_size, 1e-5, **kw)
        self.layer_norm4 = LayerNorm(config.hidden_size, 1e-5, **kw)
        self.cross_attn_image_to_token = Sam2Attention(config, **kw)
        self.skip_first_layer_pe = skip_first_layer_pe

    def __call__(self, params, queries, keys, query_pe, key_pe):
        if self.skip_first_layer_pe:
            queries = self.self_attn(params["self_attn"], queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + self.self_attn(params["self_attn"], q, q, queries)
        queries = self.layer_norm1(params["layer_norm1"], queries)

        q = queries + query_pe
        k = keys + key_pe
        queries = queries + self.cross_attn_token_to_image(
            params["cross_attn_token_to_image"], q, k, keys)
        queries = self.layer_norm2(params["layer_norm2"], queries)

        queries = queries + self.mlp(params["mlp"], queries)
        queries = self.layer_norm3(params["layer_norm3"], queries)

        q = queries + query_pe
        k = keys + key_pe
        keys = keys + self.cross_attn_image_to_token(
            params["cross_attn_image_to_token"], k, q, queries)
        keys = self.layer_norm4(params["layer_norm4"], keys)
        return queries, keys


class Sam2TwoWayTransformer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.layers = [Sam2TwoWayAttentionBlock(config, i == 0, **kw)
                       for i in range(config.num_hidden_layers)]
        self.final_attn_token_to_image = Sam2Attention(config, **kw)
        self.layer_norm_final_attn = LayerNorm(config.hidden_size, 1e-5, **kw)

    def __call__(self, params, point_embeddings, image_embeddings, image_pe):
        b, c, h, w = image_embeddings.shape
        p = point_embeddings.shape[1]
        keys = image_embeddings.reshape(b, c, h * w).transpose(0, 2, 1)[:, None]
        keys = jnp.broadcast_to(keys, (b, p, h * w, c))
        key_pe = image_pe.reshape(image_pe.shape[0], c, h * w).transpose(0, 2, 1)[:, None]
        key_pe = jnp.broadcast_to(key_pe, (b, p, h * w, c))
        queries = point_embeddings
        for i, layer in enumerate(self.layers):
            queries, keys = layer(params["layers"][str(i)], queries, keys,
                                  point_embeddings, key_pe)
        q = queries + point_embeddings
        k = keys + key_pe
        queries = queries + self.final_attn_token_to_image(
            params["final_attn_token_to_image"], q, k, keys)
        return self.layer_norm_final_attn(params["layer_norm_final_attn"], queries), keys


class Sam2MaskDecoder(Module):
    def __init__(self, config: Sam2MaskDecoderConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        h = config.hidden_size
        self.num_mask_tokens = config.num_multimask_outputs + 1
        self.iou_token = Embedding(1, h, embedding_init=normal_init(0.02), **kw)
        self.mask_tokens = Embedding(self.num_mask_tokens, h,
                                     embedding_init=normal_init(0.02), **kw)
        self.obj_score_token = Embedding(1, h, embedding_init=normal_init(0.02), **kw)
        self.transformer = Sam2TwoWayTransformer(config, **kw)
        self.upscale_conv1 = ConvTranspose2d(h, h // 4, 2, 2, **kw)
        self.upscale_conv2 = ConvTranspose2d(h // 4, h // 8, 2, 2, **kw)
        self.upscale_layer_norm = SamChannelsFirstLayerNorm(h // 4, 1e-6, **kw)
        self.output_hypernetworks_mlps = [
            Sam2FeedForward(h, h, h // 8, 3, "relu", **kw)
            for _ in range(self.num_mask_tokens)]
        self.iou_prediction_head = Sam2FeedForward(
            h, config.iou_head_hidden_dim, self.num_mask_tokens,
            config.iou_head_depth, "relu", sigmoid_output=True, **kw)
        self.pred_obj_score_head = Sam2FeedForward(h, h, 1, 3, "relu", **kw)

    def init(self, rng):
        params = super().init(rng)
        h = self.config.hidden_size
        k1, k2 = jax.random.split(rng)
        init = normal_init(0.02)
        params["conv_s0"] = {"weight": init(k1, (h // 8, h, 1, 1), self.param_dtype),
                             "bias": jnp.zeros((h // 8,), self.param_dtype)}
        params["conv_s1"] = {"weight": init(k2, (h // 4, h, 1, 1), self.param_dtype),
                             "bias": jnp.zeros((h // 4,), self.param_dtype)}
        return params

    def _stability_scores(self, mask_logits):
        delta = self.config.dynamic_multimask_stability_delta
        flat = mask_logits.reshape(*mask_logits.shape[:-2], -1)
        area_i = jnp.sum(flat > delta, axis=-1).astype(jnp.float32)
        area_u = jnp.sum(flat > -delta, axis=-1).astype(jnp.float32)
        return jnp.where(area_u > 0, area_i / area_u, 1.0)

    def _dynamic_multimask(self, masks, iou):
        multi = masks[:, :, 1:]
        multi_iou = iou[:, :, 1:]
        best = jnp.argmax(multi_iou, axis=-1)  # [B, P]
        best_masks = jnp.take_along_axis(
            multi, best[:, :, None, None, None], axis=2)
        best_iou = jnp.take_along_axis(multi_iou, best[:, :, None], axis=2)
        single = masks[:, :, 0:1]
        single_iou = iou[:, :, 0:1]
        stable = self._stability_scores(single) >= \
            self.config.dynamic_multimask_stability_thresh
        out_masks = jnp.where(stable[..., None, None], single, best_masks)
        out_iou = jnp.where(stable, single_iou, best_iou)
        return out_masks, out_iou

    def __call__(self, params, image_embeddings, image_pe, sparse_prompt_embeddings,
                 dense_prompt_embeddings, multimask_output, high_resolution_features):
        b, c, h, w = image_embeddings.shape
        p = sparse_prompt_embeddings.shape[1]
        out_tokens = jnp.concatenate([
            params["obj_score_token"]["weight"].astype(self.dtype),
            params["iou_token"]["weight"].astype(self.dtype),
            params["mask_tokens"]["weight"].astype(self.dtype)], axis=0)
        out_tokens = jnp.broadcast_to(out_tokens[None, None],
                                      (b, p, out_tokens.shape[0], c))
        tokens = jnp.concatenate([out_tokens, sparse_prompt_embeddings], axis=2)

        img = image_embeddings + dense_prompt_embeddings
        points, keys = self.transformer(params["transformer"], tokens, img, image_pe)
        iou_token_out = points[:, :, 1]
        mask_tokens_out = points[:, :, 2:2 + self.num_mask_tokens]

        img = keys.reshape(b * p, h * w, c).transpose(0, 2, 1).reshape(b * p, c, h, w)
        feat_s0, feat_s1 = high_resolution_features
        feat_s0 = jnp.repeat(feat_s0, p, axis=0)
        feat_s1 = jnp.repeat(feat_s1, p, axis=0)
        up = self.upscale_conv1(params["upscale_conv1"], img) + feat_s1
        up = jax.nn.gelu(self.upscale_layer_norm(params["upscale_layer_norm"], up),
                         approximate=False)
        up = jax.nn.gelu(self.upscale_conv2(params["upscale_conv2"], up) + feat_s0,
                         approximate=False)

        hyper = jnp.stack([
            mlp(params["output_hypernetworks_mlps"][str(i)], mask_tokens_out[:, :, i])
            for i, mlp in enumerate(self.output_hypernetworks_mlps)], axis=2)
        _, ch_up, hu, wu = up.shape
        up_flat = up.reshape(b, p, ch_up, hu * wu)
        masks = jnp.einsum("bpmc,bpcl->bpml", hyper, up_flat).reshape(b, p, -1, hu, wu)
        iou = self.iou_prediction_head(params["iou_prediction_head"], iou_token_out)
        obj = self.pred_obj_score_head(params["pred_obj_score_head"], points[:, :, 0])

        if multimask_output:
            masks = masks[:, :, 1:]
            iou = iou[:, :, 1:]
        elif self.config.dynamic_multimask_via_stability:
            masks, iou = self._dynamic_multimask(masks, iou)
        else:
            masks = masks[:, :, 0:1]
            iou = iou[:, :, 0:1]
        return masks, iou, obj

    def high_res_features(self, params, feats):
        s0 = conv2d(feats[0], params["conv_s0"]["weight"].astype(self.dtype),
                    params["conv_s0"]["bias"].astype(self.dtype))
        s1 = conv2d(feats[1], params["conv_s1"]["weight"].astype(self.dtype),
                    params["conv_s1"]["bias"].astype(self.dtype))
        return s0, s1


# -------------------------------------------------------------------- model
class Sam2PreTrainedModel(PreTrainedModel):
    config_class = Sam2Config
    base_model_prefix = "sam2"


class Sam2Model(Sam2PreTrainedModel):
    """reference :1277 — image segmentation path."""

    main_input_name = "pixel_values"

    def __init__(self, config: Sam2Config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.shared_image_embedding = Sam2PositionalEmbedding(config.prompt_encoder_config, **kw)
        self.vision_encoder = Sam2VisionModel(config.vision_config, **kw)
        self.prompt_encoder = Sam2PromptEncoder(config.prompt_encoder_config, **kw)
        self.mask_decoder = Sam2MaskDecoder(config.mask_decoder_config, **kw)
        self.backbone_feature_sizes = config.vision_config.backbone_feature_sizes
        self.hidden_dim = config.vision_config.fpn_hidden_size

    def init(self, rng):
        params = super().init(rng)
        params["no_memory_embedding"] = jnp.zeros((1, 1, self.hidden_dim), self.param_dtype)
        # tied: prompt encoder shares the positional table
        params["prompt_encoder"]["shared_embedding"] = params["shared_image_embedding"]
        return params

    @property
    def tied_weights_keys(self):
        return ("prompt_encoder.shared_embedding.positional_embedding",)

    def tie_weights(self, params):
        params["prompt_encoder"]["shared_embedding"]["positional_embedding"] = \
            params["shared_image_embedding"]["positional_embedding"]
        return params

    def _image_wide_pe(self, params, size):
        h, w = size
        y = (jnp.arange(1, h + 1, dtype=jnp.float32)[:, None] - 0.5) / h
        x = (jnp.arange(1, w + 1, dtype=jnp.float32)[None, :] - 0.5) / w
        x = jnp.broadcast_to(x, (h, w))
        y = jnp.broadcast_to(y, (h, w))
        grid = jnp.stack([x, y], axis=-1)
        pe = self.shared_image_embedding(params["shared_image_embedding"], grid)
        return pe.transpose(2, 0, 1)[None]

    def __call__(self, params, pixel_values=None, input_points=None, input_labels=None,
                 input_boxes=None, input_masks=None, image_embeddings=None,
                 multimask_output: bool = True, **kwargs) -> Sam2ImageSegmentationOutput:
        image_pe = self._image_wide_pe(params, self.prompt_encoder.image_embedding_size)
        if pixel_values is not None:
            batch_size = pixel_values.shape[0]
            feats, _ = self.vision_encoder(params["vision_encoder"], pixel_values)
            feats = [f.reshape(f.shape[0], f.shape[1], -1).transpose(2, 0, 1)
                     for f in feats]  # HW, B, C
            feats[-1] = feats[-1] + params["no_memory_embedding"].astype(self.dtype)
            image_embeddings = [
                f.transpose(1, 2, 0).reshape(batch_size, -1, *size)
                for f, size in zip(feats, self.backbone_feature_sizes)]
        else:
            batch_size = image_embeddings[-1].shape[0]
        image_pe = jnp.broadcast_to(image_pe, (batch_size, *image_pe.shape[1:]))

        if input_points is not None and input_labels is None:
            input_labels = jnp.ones(input_points.shape[:-1], jnp.int32)
        if input_points is None and input_boxes is None:
            input_points = jnp.zeros((batch_size, 1, 1, 2), self.dtype)
            input_labels = -jnp.ones((batch_size, 1, 1), jnp.int32)

        sparse, dense = self.prompt_encoder(params["prompt_encoder"], input_points,
                                            input_labels, input_boxes, input_masks)
        s0, s1 = self.mask_decoder.high_res_features(
            params["mask_decoder"], image_embeddings[:-1])
        masks, iou, obj = self.mask_decoder(
            params["mask_decoder"], image_embeddings[-1], image_pe, sparse, dense,
            multimask_output, (s0, s1))
        return Sam2ImageSegmentationOutput(
            iou_scores=iou, pred_masks=masks, object_score_logits=obj,
            image_embeddings=tuple(image_embeddings))
