"""Segment Anything (SAM), TPU-native.

Semantics match reference src/transformers/models/sam/modeling_sam.py:
- ViT-det vision encoder: windowed attention with decomposed relative
  positions (:701-833 — per-axis rel-pos tables added to logits via the
  MViTv2 einsum), window partition/unpartition with padding (:891-970),
  absolute position grid (:1043-1051), conv neck with channels-first LN
  (:975-994);
- prompt encoder: random-Fourier point/box embeddings (:546-567), label
  type embeddings with -1 (background) / -10 (padding) handling (:596-700);
- mask decoder: iou + mask tokens, two-way transformer (sparse self-attn,
  token->image and image->token cross-attn with downsampled inner dim,
  :273-406), transposed-conv upscaler + per-token hypernetwork MLPs
  (:432-546).

All spatial math is static-shape; window partitioning is pure reshapes, the
relative-position lookups are numpy constants gathered once per layer.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core.module import Conv, Embedding, LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import ModelOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from .configuration_sam import SamConfig, SamMaskDecoderConfig, SamVisionConfig


@dataclass
class SamVisionEncoderOutput(ModelOutput):
    last_hidden_state: jnp.ndarray = None
    hidden_states: Optional[tuple] = None


@dataclass
class SamImageSegmentationOutput(ModelOutput):
    iou_scores: jnp.ndarray = None
    pred_masks: jnp.ndarray = None


class SamChannelsFirstLayerNorm(LayerNorm):
    def __call__(self, params, x):  # [B, C, H, W]
        h = jnp.transpose(x, (0, 2, 3, 1))
        h = super().__call__(params, h)
        return jnp.transpose(h, (0, 3, 1, 2))


class ConvTranspose2d(Module):
    """torch ConvTranspose2d with weight layout [in, out, kH, kW]."""

    def __init__(self, in_channels, out_channels, kernel_size, stride, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel = (kernel_size, kernel_size)
        self.stride = (stride, stride)

    def init(self, rng):
        k = 1.0 / math.sqrt(self.in_channels * self.kernel[0] * self.kernel[1])
        kw, kb = jax.random.split(rng)
        w = jax.random.uniform(kw, (self.in_channels, self.out_channels, *self.kernel),
                               self.param_dtype, -k, k)
        b = jax.random.uniform(kb, (self.out_channels,), self.param_dtype, -k, k)
        return {"weight": w, "bias": b}

    def __call__(self, params, x):  # [B, C, H, W]
        # torch layout (in, out, kH, kW) reads as OIHW under
        # transpose_kernel=True (gradient-of-conv semantics; verified 0-diff
        # against torch ConvTranspose2d)
        y = jax.lax.conv_transpose(
            x.astype(self.dtype), params["weight"].astype(self.dtype),
            strides=self.stride, padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"), transpose_kernel=True)
        return y + params["bias"].astype(self.dtype)[None, :, None, None]


class SamMLPBlock(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.02))
        self.lin1 = Linear(config.hidden_size, config.mlp_dim, True, **kw)
        self.lin2 = Linear(config.mlp_dim, config.hidden_size, True, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, x):
        return self.lin2(params["lin2"], self.act(self.lin1(params["lin1"], x)))


# --------------------------------------------------------------------------
# Vision encoder
# --------------------------------------------------------------------------
class SamVisionAttention(Module):
    """Windowed attention with decomposed relative positions (:701-833)."""

    def __init__(self, config: SamVisionConfig, window_size, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        size = config.image_size // config.patch_size if window_size == 0 else window_size
        self.input_size = (size, size)
        self.num_heads = config.num_attention_heads
        self.head_dim = config.hidden_size // config.num_attention_heads
        self.scale = self.head_dim**-0.5
        self.use_rel_pos = config.use_rel_pos
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.02))
        self.qkv = Linear(config.hidden_size, 3 * config.hidden_size, config.qkv_bias, **kw)
        self.proj = Linear(config.hidden_size, config.hidden_size, True, **kw)

    def init(self, rng):
        params = super().init(rng)
        if self.use_rel_pos:
            h, w = self.input_size
            params["rel_pos_h"] = jnp.zeros((2 * h - 1, self.head_dim), self.param_dtype)
            params["rel_pos_w"] = jnp.zeros((2 * w - 1, self.head_dim), self.param_dtype)
        return params

    @staticmethod
    def _rel_index(size: int) -> np.ndarray:
        coords = np.arange(size)
        return (coords[:, None] - coords[None, :]) + size - 1  # [Q, K]

    def __call__(self, params, hidden):  # [B, H, W, C]
        b, h, w, c = hidden.shape
        qkv = self.qkv(params["qkv"], hidden.reshape(b, h * w, c))
        qkv = qkv.reshape(b, h * w, 3, self.num_heads, self.head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, HW, nH, D]
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * self.scale
        if self.use_rel_pos:
            rel_h = jnp.take(params["rel_pos_h"].astype(jnp.float32),
                             jnp.asarray(self._rel_index(h)), axis=0)  # [h, h, D]
            rel_w = jnp.take(params["rel_pos_w"].astype(jnp.float32),
                             jnp.asarray(self._rel_index(w)), axis=0)  # [w, w, D]
            qr = q.astype(jnp.float32).reshape(b, h, w, self.num_heads, self.head_dim)
            bias_h = jnp.einsum("bhwnd,hkd->bnhwk", qr, rel_h)  # [B,nH,h,w,kh]
            bias_w = jnp.einsum("bhwnd,wkd->bnhwk", qr, rel_w)  # [B,nH,h,w,kw]
            bias = bias_h[..., :, None] + bias_w[..., None, :]  # [B,nH,h,w,kh,kw]
            scores = scores + bias.reshape(b, self.num_heads, h * w, h * w)
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, h, w, c)
        return self.proj(params["proj"], out)


class SamVisionLayer(Module):
    def __init__(self, config, window_size, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.layer_norm1 = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.attn = SamVisionAttention(config, window_size, **kw)
        self.layer_norm2 = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.mlp = SamMLPBlock(config, **kw)
        self.window_size = window_size

    def __call__(self, params, hidden):  # [B, H, W, C]
        b, height, width, c = hidden.shape
        residual = hidden
        h = self.layer_norm1(params["layer_norm1"], hidden)
        ws = self.window_size
        if ws > 0:
            pad_h = (ws - height % ws) % ws
            pad_w = (ws - width % ws) % ws
            if pad_h or pad_w:
                h = jnp.pad(h, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
            hp, wp = height + pad_h, width + pad_w
            h = h.reshape(b, hp // ws, ws, wp // ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
            h = h.reshape(-1, ws, ws, c)
        h = self.attn(params["attn"], h)
        if ws > 0:
            h = h.reshape(b, hp // ws, wp // ws, ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
            h = h.reshape(b, hp, wp, c)[:, :height, :width]
        hidden = residual + h
        h = self.layer_norm2(params["layer_norm2"], hidden)
        return hidden + self.mlp(params["mlp"], h)


class SamVisionNeck(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.conv1 = Conv(config.hidden_size, config.output_channels, 1, stride=1,
                          padding=0, use_bias=False, ndim=2, **kw)
        self.layer_norm1 = SamChannelsFirstLayerNorm(config.output_channels, 1e-6, **kw)
        self.conv2 = Conv(config.output_channels, config.output_channels, 3, stride=1,
                          padding=1, use_bias=False, ndim=2, **kw)
        self.layer_norm2 = SamChannelsFirstLayerNorm(config.output_channels, 1e-6, **kw)

    def __call__(self, params, hidden):  # [B, H, W, C] -> [B, Cout, H, W]
        h = jnp.transpose(hidden, (0, 3, 1, 2))
        h = self.layer_norm1(params["layer_norm1"], self.conv1(params["conv1"], h))
        return self.layer_norm2(params["layer_norm2"], self.conv2(params["conv2"], h))


class SamVisionEncoder(Module):
    def __init__(self, config: SamVisionConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.patch_embed = _SamPatchEmbed(config, **kw)
        self.layers = [
            SamVisionLayer(config,
                           0 if i in config.global_attn_indexes else config.window_size, **kw)
            for i in range(config.num_hidden_layers)
        ]
        self.neck = SamVisionNeck(config, **kw)
        self.grid = config.image_size // config.patch_size

    def init(self, rng):
        params = super().init(rng)
        if self.config.use_abs_pos:
            params["pos_embed"] = jnp.zeros(
                (1, self.grid, self.grid, self.config.hidden_size), self.param_dtype)
        return params

    def __call__(self, params, pixel_values) -> SamVisionEncoderOutput:
        h = self.patch_embed(params["patch_embed"], pixel_values)  # [B, H, W, C]
        if self.config.use_abs_pos:
            h = h + params["pos_embed"].astype(h.dtype)
        for i, layer in enumerate(self.layers):
            h = layer(params["layers"][str(i)], h)
        return SamVisionEncoderOutput(last_hidden_state=self.neck(params["neck"], h))


class _SamPatchEmbed(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.projection = Conv(config.num_channels, config.hidden_size, config.patch_size,
                               stride=config.patch_size, padding=0, use_bias=True, ndim=2,
                               dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, pixel_values):
        x = self.projection(params["projection"], pixel_values)  # [B, C, H, W]
        return jnp.transpose(x, (0, 2, 3, 1))


# --------------------------------------------------------------------------
# Prompt encoder
# --------------------------------------------------------------------------
class SamPositionalEmbedding(Module):
    """Random Fourier features over [0,1]^2 coords (:546-567)."""

    def __init__(self, config: SamVisionConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.scale = config.scale
        self.num_pos_feats = config.num_pos_feats

    def init(self, rng):
        return {"positional_embedding": self.scale * jax.random.normal(
            rng, (2, self.num_pos_feats), self.param_dtype)}

    def __call__(self, params, coords, input_shape=None):
        c = coords.astype(jnp.float32)
        if input_shape is not None:
            c = c.at[..., 0].set(c[..., 0] / input_shape[1])
            c = c.at[..., 1].set(c[..., 1] / input_shape[0])
        c = 2 * c - 1
        c = c @ params["positional_embedding"].astype(jnp.float32)
        c = 2 * np.pi * c
        return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)


class SamMaskEmbedding(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        ch = config.mask_input_channels // 4
        self.conv1 = Conv(1, ch, 2, stride=2, padding=0, use_bias=True, ndim=2, **kw)
        self.layer_norm1 = SamChannelsFirstLayerNorm(ch, config.layer_norm_eps, **kw)
        self.conv2 = Conv(ch, config.mask_input_channels, 2, stride=2, padding=0,
                          use_bias=True, ndim=2, **kw)
        self.layer_norm2 = SamChannelsFirstLayerNorm(config.mask_input_channels,
                                                     config.layer_norm_eps, **kw)
        self.conv3 = Conv(config.mask_input_channels, config.hidden_size, 1, stride=1,
                          padding=0, use_bias=True, ndim=2, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, masks):
        h = self.act(self.layer_norm1(params["layer_norm1"], self.conv1(params["conv1"], masks)))
        h = self.act(self.layer_norm2(params["layer_norm2"], self.conv2(params["conv2"], h)))
        return self.conv3(params["conv3"], h)


class SamPromptEncoder(Module):
    def __init__(self, config: SamConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        pe = config.prompt_encoder_config
        self.mask_embed = SamMaskEmbedding(pe, **kw)
        self.no_mask_embed = Embedding(1, pe.hidden_size, **kw)
        self.point_embed = [Embedding(1, pe.hidden_size, **kw)
                            for _ in range(pe.num_point_embeddings)]
        self.not_a_point_embed = Embedding(1, pe.hidden_size, **kw)
        self.image_embedding_size = pe.image_embedding_size
        self.input_image_size = pe.image_size
        self.hidden_size = pe.hidden_size

    def embed_points(self, params, shared_fn, shared_params, points, labels, pad):
        points = points + 0.5
        if pad:
            b, pb = points.shape[0], points.shape[1]
            points = jnp.concatenate([points, jnp.zeros((b, pb, 1, 2), points.dtype)], axis=2)
            labels = jnp.concatenate([labels, -jnp.ones((b, pb, 1), labels.dtype)], axis=2)
        shape = (self.input_image_size, self.input_image_size)
        emb = shared_fn(shared_params, points, shape)
        nap = params["not_a_point_embed"]["weight"].astype(emb.dtype)
        emb = jnp.where(labels[..., None] == -1, nap, emb)
        emb = jnp.where(labels[..., None] != -10, emb, jnp.zeros_like(emb))
        p0 = params["point_embed"]["0"]["weight"].astype(emb.dtype)
        p1 = params["point_embed"]["1"]["weight"].astype(emb.dtype)
        emb = jnp.where((labels == 0)[..., None], emb + p0, emb)
        emb = jnp.where((labels == 1)[..., None], emb + p1, emb)
        return emb

    def embed_boxes(self, params, shared_fn, shared_params, boxes):
        boxes = boxes + 0.5
        b, n = boxes.shape[:2]
        coords = boxes.reshape(b, n, 2, 2)
        shape = (self.input_image_size, self.input_image_size)
        emb = shared_fn(shared_params, coords, shape)
        p2 = params["point_embed"]["2"]["weight"].astype(emb.dtype)
        p3 = params["point_embed"]["3"]["weight"].astype(emb.dtype)
        emb = emb.at[:, :, 0, :].add(p2[0])
        emb = emb.at[:, :, 1, :].add(p3[0])
        return emb

    def __call__(self, params, shared_fn, shared_params, input_points, input_labels,
                 input_boxes, input_masks, batch_size):
        sparse = None
        if input_points is not None:
            sparse = self.embed_points(params, shared_fn, shared_params, input_points,
                                       input_labels, pad=input_boxes is None)
        if input_boxes is not None:
            boxes = self.embed_boxes(params, shared_fn, shared_params, input_boxes)
            sparse = boxes if sparse is None else jnp.concatenate([sparse, boxes], axis=2)
        if input_masks is not None:
            dense = self.mask_embed(params["mask_embed"], input_masks)
        else:
            dense = params["no_mask_embed"]["weight"].reshape(1, -1, 1, 1)
            dense = jnp.broadcast_to(dense, (batch_size, self.hidden_size,
                                             self.image_embedding_size,
                                             self.image_embedding_size))
        return sparse, dense


# --------------------------------------------------------------------------
# Mask decoder
# --------------------------------------------------------------------------
class SamAttention(Module):
    """Attention with optional internal-dim downsampling (:195-270); inputs
    are [B, point_batch, N, C]."""

    def __init__(self, config, downsample_rate=None, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        rate = config.attention_downsample_rate if downsample_rate is None else downsample_rate
        self.internal_dim = config.hidden_size // rate
        self.num_heads = config.num_attention_heads
        self.scale = (self.internal_dim // self.num_heads) ** -0.5
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.02))
        self.q_proj = Linear(config.hidden_size, self.internal_dim, True, **kw)
        self.k_proj = Linear(config.hidden_size, self.internal_dim, True, **kw)
        self.v_proj = Linear(config.hidden_size, self.internal_dim, True, **kw)
        self.out_proj = Linear(self.internal_dim, config.hidden_size, True, **kw)

    def __call__(self, params, query, key, value):
        # reference _separate_heads flattens (batch, point_batch): queries
        # come in as [B, pb, N, C] while image keys are [B*pb, 1, HW, C] —
        # both collapse to the same leading dim (:221-230).
        pb_q = query.shape[1]
        q = self.q_proj(params["q_proj"], query)
        k = self.k_proj(params["k_proj"], key)
        v = self.v_proj(params["v_proj"], value)
        d = self.internal_dim // self.num_heads

        def heads(x):
            b, pb, n, c = x.shape
            return x.reshape(b * pb, n, self.num_heads, d)

        q, k, v = heads(q), heads(k), heads(v)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * self.scale
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        bn, n = out.shape[:2]
        out = out.reshape(bn // pb_q, pb_q, n, self.internal_dim)
        return self.out_proj(params["out_proj"], out)


class SamTwoWayAttentionBlock(Module):
    def __init__(self, config, skip_first_layer_pe, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        eps = config.layer_norm_eps
        self.self_attn = SamAttention(config, downsample_rate=1, **kw)
        self.layer_norm1 = LayerNorm(config.hidden_size, eps, **kw)
        self.cross_attn_token_to_image = SamAttention(config, **kw)
        self.layer_norm2 = LayerNorm(config.hidden_size, eps, **kw)
        self.mlp = SamMLPBlock(config, **kw)
        self.layer_norm3 = LayerNorm(config.hidden_size, eps, **kw)
        self.layer_norm4 = LayerNorm(config.hidden_size, eps, **kw)
        self.cross_attn_image_to_token = SamAttention(config, **kw)
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


class SamTwoWayTransformer(Module):
    def __init__(self, config: SamMaskDecoderConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.layers = [SamTwoWayAttentionBlock(config, i == 0, **kw)
                       for i in range(config.num_hidden_layers)]
        self.final_attn_token_to_image = SamAttention(config, **kw)
        self.layer_norm_final_attn = LayerNorm(config.hidden_size, 1e-5, **kw)

    def __call__(self, params, point_embeddings, image_embeddings, image_pe):
        b, c, h, w = image_embeddings.shape
        keys = image_embeddings.reshape(b, c, h * w).transpose(0, 2, 1)[:, None]
        key_pe = image_pe.reshape(b, c, h * w).transpose(0, 2, 1)[:, None]
        queries = point_embeddings
        for i, layer in enumerate(self.layers):
            queries, keys = layer(params["layers"][str(i)], queries, keys,
                                  point_embeddings, key_pe)
        q = queries + point_embeddings
        k = keys + key_pe
        queries = queries + self.final_attn_token_to_image(
            params["final_attn_token_to_image"], q, k, keys)
        queries = self.layer_norm_final_attn(params["layer_norm_final_attn"], queries)
        return queries, keys


class SamFeedForward(Module):
    def __init__(self, input_dim, hidden_dim, output_dim, num_layers,
                 sigmoid_output=False, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.02))
        self.proj_in = Linear(input_dim, hidden_dim, True, **kw)
        self.proj_out = Linear(hidden_dim, output_dim, True, **kw)
        self.layers = [Linear(hidden_dim, hidden_dim, True, **kw)
                       for _ in range(num_layers - 2)]
        self.sigmoid_output = sigmoid_output

    def __call__(self, params, x):
        h = jax.nn.relu(self.proj_in(params["proj_in"], x))
        for i, layer in enumerate(self.layers):
            h = jax.nn.relu(layer(params["layers"][str(i)], h))
        h = self.proj_out(params["proj_out"], h)
        return jax.nn.sigmoid(h) if self.sigmoid_output else h


class SamMaskDecoder(Module):
    def __init__(self, config: SamMaskDecoderConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.hidden_size = config.hidden_size
        self.num_mask_tokens = config.num_multimask_outputs + 1
        self.iou_token = Embedding(1, config.hidden_size, **kw)
        self.mask_tokens = Embedding(self.num_mask_tokens, config.hidden_size, **kw)
        self.transformer = SamTwoWayTransformer(config, **kw)
        self.upscale_conv1 = ConvTranspose2d(config.hidden_size, config.hidden_size // 4,
                                             2, 2, **kw)
        self.upscale_conv2 = ConvTranspose2d(config.hidden_size // 4, config.hidden_size // 8,
                                             2, 2, **kw)
        self.upscale_layer_norm = SamChannelsFirstLayerNorm(config.hidden_size // 4, 1e-6, **kw)
        self.output_hypernetworks_mlps = [
            SamFeedForward(config.hidden_size, config.hidden_size,
                           config.hidden_size // 8, 3, **kw)
            for _ in range(self.num_mask_tokens)
        ]
        self.iou_prediction_head = SamFeedForward(
            config.hidden_size, config.iou_head_hidden_dim, self.num_mask_tokens,
            config.iou_head_depth, **kw)

    def __call__(self, params, image_embeddings, image_pe, sparse_prompt_embeddings,
                 dense_prompt_embeddings, multimask_output):
        b, c, h, w = image_embeddings.shape
        pb = sparse_prompt_embeddings.shape[1] if sparse_prompt_embeddings is not None else 1
        out_tokens = jnp.concatenate([params["iou_token"]["weight"],
                                      params["mask_tokens"]["weight"]], axis=0)
        out_tokens = jnp.broadcast_to(out_tokens[None, None],
                                      (b, pb, *out_tokens.shape)).astype(self.dtype)
        if sparse_prompt_embeddings is not None:
            tokens = jnp.concatenate([out_tokens,
                                      sparse_prompt_embeddings.astype(self.dtype)], axis=2)
        else:
            tokens = out_tokens

        img = image_embeddings + dense_prompt_embeddings
        img = jnp.repeat(img, pb, axis=0)
        pe = jnp.repeat(image_pe, pb, axis=0)

        point_embedding, keys = self.transformer(params["transformer"], tokens, img, pe)
        iou_token_out = point_embedding[:, :, 0]
        mask_tokens_out = point_embedding[:, :, 1:1 + self.num_mask_tokens]

        keys = keys[:, 0].transpose(0, 2, 1).reshape(b * pb, c, h, w)
        up = self.upscale_conv1(params["upscale_conv1"], keys)
        up = jax.nn.gelu(self.upscale_layer_norm(params["upscale_layer_norm"], up),
                         approximate=False)
        up = jax.nn.gelu(self.upscale_conv2(params["upscale_conv2"], up), approximate=False)

        hyper = jnp.stack([
            mlp(params["output_hypernetworks_mlps"][str(i)], mask_tokens_out[:, :, i])
            for i, mlp in enumerate(self.output_hypernetworks_mlps)
        ], axis=2)  # [B, pb, num_mask_tokens, C//8]
        _, cu, hu, wu = up.shape
        up = up.reshape(b, pb, cu, hu * wu)
        masks = (hyper @ up).reshape(b, pb, -1, hu, wu)
        iou_pred = self.iou_prediction_head(params["iou_prediction_head"], iou_token_out)

        sl = slice(1, None) if multimask_output else slice(0, 1)
        return masks[:, :, sl], iou_pred[:, :, sl]


# --------------------------------------------------------------------------
# Full model
# --------------------------------------------------------------------------
class SamPreTrainedModel(PreTrainedModel):
    config_class = SamConfig
    base_model_prefix = "sam"
    main_input_name = "pixel_values"
    # tied to shared_image_embedding (reference _tied_weights_keys)
    _keys_to_ignore_on_load_unexpected = (r"^prompt_encoder\.shared_embedding\.",)


class SamModel(SamPreTrainedModel):
    def __init__(self, config: SamConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.shared_image_embedding = SamPositionalEmbedding(config.vision_config, **kw)
        self.vision_encoder = SamVisionEncoder(config.vision_config, **kw)
        self.prompt_encoder = SamPromptEncoder(config, **kw)
        self.mask_decoder = SamMaskDecoder(config.mask_decoder_config, **kw)

    def image_wide_pe(self, params, batch_size):
        size = self.config.prompt_encoder_config.image_embedding_size
        grid = jnp.ones((size, size), jnp.float32)
        y = (jnp.cumsum(grid, axis=0) - 0.5) / size
        x = (jnp.cumsum(grid, axis=1) - 0.5) / size
        pe = self.shared_image_embedding(params["shared_image_embedding"],
                                         jnp.stack([x, y], axis=-1))
        pe = jnp.transpose(pe, (2, 0, 1))[None]
        return jnp.broadcast_to(pe, (batch_size, *pe.shape[1:]))

    def get_image_embeddings(self, params, pixel_values):
        return self.vision_encoder(params["vision_encoder"], pixel_values).last_hidden_state

    def __call__(self, params, pixel_values=None, input_points=None, input_labels=None,
                 input_boxes=None, input_masks=None, image_embeddings=None,
                 multimask_output=True, **kwargs) -> SamImageSegmentationOutput:
        if image_embeddings is None:
            image_embeddings = self.get_image_embeddings(params, pixel_values)
        batch_size = image_embeddings.shape[0]
        image_pe = self.image_wide_pe(params, batch_size)
        if input_points is not None and input_labels is None:
            input_labels = jnp.ones(input_points.shape[:3], jnp.int32)
        sparse, dense = self.prompt_encoder(
            params["prompt_encoder"], self.shared_image_embedding,
            params["shared_image_embedding"], input_points, input_labels, input_boxes,
            input_masks, batch_size)
        masks, iou = self.mask_decoder(
            params["mask_decoder"], image_embeddings, image_pe, sparse, dense,
            multimask_output)
        return SamImageSegmentationOutput(iou_scores=iou, pred_masks=masks)


class SamVisionModel(SamPreTrainedModel):
    config_class = SamVisionConfig

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.vision_encoder = SamVisionEncoder(config, dtype=self.dtype,
                                               param_dtype=self.param_dtype)

    def __call__(self, params, pixel_values, **kwargs):
        return self.vision_encoder(params["vision_encoder"], pixel_values)
