"""SuperPoint keypoint detector, TPU-native.

Semantics match reference src/transformers/models/superpoint/modeling_superpoint.py:
VGG-style conv encoder (:110-188), 65-way per-cell keypoint head with
depth-to-space to pixel scores + iterative-suppression NMS (:190-260,
:55-70 ``simple_nms``), descriptor head with bilinear sampling at keypoint
locations (align_corners grid_sample, :262-320), border removal and top-k.

TPU-first redesign: keypoint extraction is STATIC — every image yields
exactly ``max_keypoints`` slots ordered by score (``jax.lax.top_k``) with a
validity mask (``score > keypoint_threshold``), instead of the reference's
data-dependent ``nonzero`` + per-image Python loop. Masked slots are zeroed
to mirror the reference's padding. When ``config.max_keypoints`` is -1
(unbounded in the reference) a cap of 1024 slots is used.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from ...core.module import Conv, Module
from ...modeling_outputs import ModelOutput
from ...modeling_utils import PreTrainedModel
from .configuration_superpoint import SuperPointConfig


@dataclass
class SuperPointKeypointDescriptionOutput(ModelOutput):
    loss: Optional[jnp.ndarray] = None
    keypoints: jnp.ndarray = None
    scores: jnp.ndarray = None
    descriptors: jnp.ndarray = None
    mask: jnp.ndarray = None
    hidden_states: Optional[tuple] = None


def max_pool_same(x: jnp.ndarray, radius: int) -> jnp.ndarray:
    """(2r+1)-window max pool, stride 1, same padding, over [B, H, W]."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2 * radius + 1, 2 * radius + 1), (1, 1, 1), "SAME")


def simple_nms(scores: jnp.ndarray, radius: int) -> jnp.ndarray:
    """reference simple_nms (:55-70): keep local maxima, two suppression
    rounds."""
    zeros = jnp.zeros_like(scores)
    max_mask = scores == max_pool_same(scores, radius)
    for _ in range(2):
        supp_mask = max_pool_same(max_mask.astype(scores.dtype), radius) > 0
        supp_scores = jnp.where(supp_mask, zeros, scores)
        new_max_mask = supp_scores == max_pool_same(supp_scores, radius)
        max_mask = max_mask | (new_max_mask & ~supp_mask)
    return jnp.where(max_mask, scores, zeros)


def bilinear_sample(feature: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """grid_sample(align_corners=True) at K points.

    feature: [C, H, W]; pts: [K, 2] normalized (x, y) in (-1, 1).
    Returns [K, C].
    """
    c, h, w = feature.shape
    x = (pts[:, 0] + 1.0) / 2.0 * (w - 1)
    y = (pts[:, 1] + 1.0) / 2.0 * (h - 1)
    x0 = jnp.clip(jnp.floor(x), 0, w - 1)
    y0 = jnp.clip(jnp.floor(y), 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    wx = x - x0
    wy = y - y0
    x0, x1, y0, y1 = x0.astype(jnp.int32), x1.astype(jnp.int32), y0.astype(jnp.int32), y1.astype(jnp.int32)
    flat = feature.reshape(c, h * w)

    def gather(yy, xx):
        return flat[:, yy * w + xx].T  # [K, C]

    top = gather(y0, x0) * (1 - wx)[:, None] + gather(y0, x1) * wx[:, None]
    bot = gather(y1, x0) * (1 - wx)[:, None] + gather(y1, x1) * wx[:, None]
    return top * (1 - wy)[:, None] + bot * wy[:, None]


class SuperPointConvBlock(Module):
    def __init__(self, config, in_ch, out_ch, add_pooling, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.conv_a = Conv(in_ch, out_ch, 3, stride=1, padding=1, use_bias=True, ndim=2, **kw)
        self.conv_b = Conv(out_ch, out_ch, 3, stride=1, padding=1, use_bias=True, ndim=2, **kw)
        self.add_pooling = add_pooling

    def __call__(self, params, x):
        x = jax.nn.relu(self.conv_a(params["conv_a"], x))
        x = jax.nn.relu(self.conv_b(params["conv_b"], x))
        if self.add_pooling:
            x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID")
        return x


class SuperPointEncoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        sizes = config.encoder_hidden_sizes
        blocks = [SuperPointConvBlock(config, 1, sizes[0], True, **kw)]
        for i in range(1, len(sizes) - 1):
            blocks.append(SuperPointConvBlock(config, sizes[i - 1], sizes[i], True, **kw))
        blocks.append(SuperPointConvBlock(config, sizes[-2], sizes[-1], False, **kw))
        self.conv_blocks = blocks

    def __call__(self, params, x):
        for i, block in enumerate(self.conv_blocks):
            x = block(params["conv_blocks"][str(i)], x)
        return x


class SuperPointInterestPointDecoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.conv_score_a = Conv(config.encoder_hidden_sizes[-1], config.decoder_hidden_size,
                                 3, stride=1, padding=1, use_bias=True, ndim=2, **kw)
        self.conv_score_b = Conv(config.decoder_hidden_size, config.keypoint_decoder_dim,
                                 1, stride=1, padding=0, use_bias=True, ndim=2, **kw)

    def pixel_scores(self, params, encoded):
        s = jax.nn.relu(self.conv_score_a(params["conv_score_a"], encoded))
        s = self.conv_score_b(params["conv_score_b"], s)
        s = jax.nn.softmax(s, axis=1)[:, :-1]  # [B, 64, Hc, Wc]
        b, _, hc, wc = s.shape
        s = s.transpose(0, 2, 3, 1).reshape(b, hc, wc, 8, 8)
        s = s.transpose(0, 1, 3, 2, 4).reshape(b, hc * 8, wc * 8)
        return simple_nms(s, self.config.nms_radius)

    def __call__(self, params, encoded, k: int):
        scores = self.pixel_scores(params, encoded)  # [B, H, W]
        b, h, w = scores.shape
        border = self.config.border_removal_distance
        ys = jnp.arange(h)
        xs = jnp.arange(w)
        interior = ((ys >= border) & (ys < h - border))[:, None] & \
                   ((xs >= border) & (xs < w - border))[None, :]
        masked = jnp.where(interior[None], scores, 0.0)
        top_scores, top_idx = jax.lax.top_k(masked.reshape(b, h * w), k)
        yy = top_idx // w
        xx = top_idx % w
        keypoints = jnp.stack([xx, yy], axis=-1).astype(jnp.float32)  # (x, y)
        valid = top_scores > self.config.keypoint_threshold
        return keypoints, top_scores, valid


class SuperPointDescriptorDecoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.conv_descriptor_a = Conv(config.encoder_hidden_sizes[-1], config.decoder_hidden_size,
                                      3, stride=1, padding=1, use_bias=True, ndim=2, **kw)
        self.conv_descriptor_b = Conv(config.decoder_hidden_size, config.descriptor_decoder_dim,
                                      1, stride=1, padding=0, use_bias=True, ndim=2, **kw)

    def __call__(self, params, encoded, keypoints):
        """encoded [B, C, Hc, Wc]; keypoints [B, K, 2] absolute (x, y)."""
        d = self.conv_descriptor_b(params["conv_descriptor_b"],
                                   jax.nn.relu(self.conv_descriptor_a(params["conv_descriptor_a"], encoded)))
        d = d / jnp.maximum(jnp.linalg.norm(d, axis=1, keepdims=True), 1e-12)
        b, c, hc, wc = d.shape
        scale = 8
        kp = keypoints - scale / 2 + 0.5
        divisor = jnp.asarray([wc * scale - scale / 2 - 0.5, hc * scale - scale / 2 - 0.5],
                              jnp.float32)
        kp = kp / divisor * 2 - 1
        sampled = jax.vmap(bilinear_sample)(d, kp)  # [B, K, C]
        norm = jnp.maximum(jnp.linalg.norm(sampled, axis=-1, keepdims=True), 1e-12)
        return sampled / norm


class SuperPointPreTrainedModel(PreTrainedModel):
    config_class = SuperPointConfig
    base_model_prefix = "superpoint"
    main_input_name = "pixel_values"


class SuperPointForKeypointDetection(SuperPointPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.encoder = SuperPointEncoder(config, **kw)
        self.keypoint_decoder = SuperPointInterestPointDecoder(config, **kw)
        self.descriptor_decoder = SuperPointDescriptorDecoder(config, **kw)

    def __call__(self, params, pixel_values, **kwargs) -> SuperPointKeypointDescriptionOutput:
        # channel 0 of (assumed grayscale-replicated) RGB input (reference
        # extract_one_channel_pixel_values)
        x = pixel_values[:, :1]
        b, _, height, width = x.shape
        encoded = self.encoder(params["encoder"], x.astype(self.dtype))
        k = self.config.max_keypoints if self.config.max_keypoints > 0 else min(height * width, 1024)
        keypoints, scores, valid = self.keypoint_decoder(params["keypoint_decoder"], encoded, k)
        descriptors = self.descriptor_decoder(params["descriptor_decoder"], encoded, keypoints)
        # zero padded slots like the reference's padded batch output
        keypoints = jnp.where(valid[..., None], keypoints, 0.0)
        scores = jnp.where(valid, scores, 0.0)
        descriptors = jnp.where(valid[..., None], descriptors, 0.0)
        rel = keypoints / jnp.asarray([width, height], jnp.float32)
        return SuperPointKeypointDescriptionOutput(
            keypoints=rel, scores=scores, descriptors=descriptors,
            mask=valid.astype(jnp.int32))
