"""SuperGlue keypoint matcher, TPU-native.

Semantics match reference src/transformers/models/superglue/modeling_superglue.py:
SuperPoint detections -> keypoint MLP encoder with eval-mode BatchNorm1d
(:189-233), attentional GNN alternating self/cross layers over the image
pair (:401-454, cross swaps the pair halves), final projection, descriptor
similarity scaled by sqrt(hidden), log-space Sinkhorn optimal transport with
a learned dustbin score (:71-143), mutual-max matching with a score
threshold (:622-650).

All shapes are static: the SuperPoint stage emits exactly K keypoint slots
per image with a validity mask; masked slots are excluded from attention and
from the score matrix (min-filled), matching the reference's padded-batch
path bit-for-bit.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from ...core.module import Linear, Module, normal_init
from ...modeling_outputs import ModelOutput
from ...modeling_utils import PreTrainedModel
from ..superpoint.modeling_superpoint import SuperPointForKeypointDetection
from .configuration_superglue import SuperGlueConfig


@dataclass
class SuperGlueKeypointMatchingOutput(ModelOutput):
    loss: Optional[jnp.ndarray] = None
    matches: jnp.ndarray = None
    matching_scores: jnp.ndarray = None
    keypoints: jnp.ndarray = None
    mask: jnp.ndarray = None


def normalize_keypoints(keypoints, height, width):
    """reference :50-69."""
    size = jnp.asarray([width, height], jnp.float32)[None]
    center = size / 2
    scaling = size.max(axis=1, keepdims=True) * 0.7
    return (keypoints - center[:, None, :]) / scaling[:, None, :]


def log_optimal_transport(scores, reg_param, iterations):
    """reference :71-143 (log-space Sinkhorn with dustbin row/column)."""
    b, m, n = scores.shape
    one = jnp.asarray(1.0, scores.dtype)
    ms, ns = m * one, n * one
    src_bin = jnp.broadcast_to(reg_param, (b, m, 1))
    tgt_bin = jnp.broadcast_to(reg_param, (b, 1, n))
    bin_bin = jnp.broadcast_to(reg_param, (b, 1, 1))
    couplings = jnp.concatenate([
        jnp.concatenate([scores, src_bin], -1),
        jnp.concatenate([tgt_bin, bin_bin], -1),
    ], 1)
    norm = -jnp.log(ms + ns)
    log_mu = jnp.concatenate([jnp.full((m,), norm), jnp.log(ns)[None] + norm])
    log_nu = jnp.concatenate([jnp.full((n,), norm), jnp.log(ms)[None] + norm])
    log_mu = jnp.broadcast_to(log_mu[None], (b, m + 1))
    log_nu = jnp.broadcast_to(log_nu[None], (b, n + 1))

    def body(_, uv):
        u, v = uv
        u = log_mu - jax.nn.logsumexp(couplings + v[:, None, :], axis=2)
        v = log_nu - jax.nn.logsumexp(couplings + u[:, :, None], axis=1)
        return u, v

    u0 = jnp.zeros_like(log_mu)
    v0 = jnp.zeros_like(log_nu)
    u, v = jax.lax.fori_loop(0, iterations, body, (u0, v0))
    return couplings + u[:, :, None] + v[:, None, :] - norm


class SuperGlueMLPLayer(Module):
    """Linear + eval-mode BatchNorm1d + ReLU (reference :189-203)."""

    def __init__(self, in_ch, out_ch, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.linear = Linear(in_ch, out_ch, True, dtype=dtype, param_dtype=param_dtype,
                             kernel_init=normal_init(0.02))
        self.out_ch = out_ch

    def init(self, rng):
        params = super().init(rng)
        params["batch_norm"] = {
            "weight": jnp.ones((self.out_ch,), self.param_dtype),
            "bias": jnp.zeros((self.out_ch,), self.param_dtype),
            "running_mean": jnp.zeros((self.out_ch,), self.param_dtype),
            "running_var": jnp.ones((self.out_ch,), self.param_dtype),
            "num_batches_tracked": jnp.zeros((), jnp.int32),
        }
        return params

    def __call__(self, params, x):
        h = self.linear(params["linear"], x).astype(jnp.float32)
        bn = params["batch_norm"]
        h = (h - bn["running_mean"].astype(jnp.float32)) * jax.lax.rsqrt(
            bn["running_var"].astype(jnp.float32) + 1e-5)
        h = h * bn["weight"].astype(jnp.float32) + bn["bias"].astype(jnp.float32)
        return jax.nn.relu(h).astype(self.dtype)


class SuperGlueKeypointEncoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        channels = [3] + config.keypoint_encoder_sizes + [config.hidden_size]
        layers = [SuperGlueMLPLayer(channels[i - 1], channels[i], **kw)
                  for i in range(1, len(channels) - 1)]
        layers.append(Linear(channels[-2], channels[-1], True, dtype=dtype,
                             param_dtype=param_dtype, kernel_init=normal_init(0.02)))
        self.encoder = layers

    def __call__(self, params, keypoints, scores):
        h = jnp.concatenate([keypoints, scores[..., None]], axis=-1)
        for i, layer in enumerate(self.encoder):
            h = layer(params["encoder"][str(i)], h)
        return h


class SuperGlueAttention(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.num_heads = config.num_attention_heads
        self.head_dim = config.hidden_size // config.num_attention_heads
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.02))
        self.self = _SGSelf(config, **kw)
        self.output = _SGOut(config, **kw)

    def __call__(self, params, hidden, kv, mask_bias):
        h = self.self(params["self"], hidden, kv, mask_bias)
        return self.output(params["output"], h)


class _SGSelf(Module):
    def __init__(self, config, *, dtype, param_dtype, kernel_init):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.num_heads = config.num_attention_heads
        self.head_dim = config.hidden_size // config.num_attention_heads
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=kernel_init)
        e = config.hidden_size
        self.query = Linear(e, e, True, **kw)
        self.key = Linear(e, e, True, **kw)
        self.value = Linear(e, e, True, **kw)

    def __call__(self, params, hidden, kv, mask_bias):
        b, n, e = hidden.shape
        q = self.query(params["query"], hidden).reshape(b, n, self.num_heads, self.head_dim)
        k = self.key(params["key"], kv).reshape(b, -1, self.num_heads, self.head_dim)
        v = self.value(params["value"], kv).reshape(b, -1, self.num_heads, self.head_dim)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) / (self.head_dim**0.5)
        if mask_bias is not None:
            scores = scores + mask_bias
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        return out.reshape(b, n, e)


class _SGOut(Module):
    def __init__(self, config, *, dtype, param_dtype, kernel_init):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.dense = Linear(config.hidden_size, config.hidden_size, True, dtype=dtype,
                            param_dtype=param_dtype, kernel_init=kernel_init)

    def __call__(self, params, hidden):
        return self.dense(params["dense"], hidden)


class SuperGlueAttentionalPropagation(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        e = config.hidden_size
        self.attention = SuperGlueAttention(config, **kw)
        self.mlp = [SuperGlueMLPLayer(e * 2, e * 2, **kw),
                    Linear(e * 2, e, True, dtype=dtype, param_dtype=param_dtype,
                           kernel_init=normal_init(0.02))]

    def __call__(self, params, descriptors, kv, mask_bias):
        out = self.attention(params["attention"], descriptors, kv, mask_bias)
        h = jnp.concatenate([descriptors, out], axis=-1)
        for i, layer in enumerate(self.mlp):
            h = layer(params["mlp"][str(i)], h)
        return h


class SuperGlueAttentionalGNN(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.hidden_size = config.hidden_size
        self.layers_types = config.gnn_layers_types
        self.layers = [SuperGlueAttentionalPropagation(config, **kw)
                       for _ in self.layers_types]

    def __call__(self, params, descriptors, mask):
        """descriptors [B*2, K, C]; mask [B*2, K] (1 = valid)."""
        bn, k, c = descriptors.shape
        self_bias = None
        if mask is not None:
            self_bias = jnp.where(mask.astype(bool), 0.0, -1e9)[:, None, None, :]
        for idx, (layer, layer_type) in enumerate(zip(self.layers, self.layers_types)):
            if layer_type == "cross":
                kv = descriptors.reshape(-1, 2, k, c)[:, ::-1].reshape(bn, k, c)
                bias = None
                if mask is not None:
                    cross_mask = mask.reshape(-1, 2, k)[:, ::-1].reshape(bn, k)
                    bias = jnp.where(cross_mask.astype(bool), 0.0, -1e9)[:, None, None, :]
            else:
                kv = descriptors
                bias = self_bias
            delta = layer(params["layers"][str(idx)], descriptors, kv, bias)
            descriptors = descriptors + delta
        return descriptors


class _SGFinalProjection(Module):
    """wrapper matching the checkpoint's ``final_projection.final_proj`` path."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.final_proj = Linear(config.hidden_size, config.hidden_size, True, dtype=dtype,
                                 param_dtype=param_dtype, kernel_init=normal_init(0.02))

    def __call__(self, params, x):
        return self.final_proj(params["final_proj"], x)


class SuperGluePreTrainedModel(PreTrainedModel):
    config_class = SuperGlueConfig
    base_model_prefix = "superglue"
    main_input_name = "pixel_values"


class SuperGlueForKeypointMatching(SuperGluePreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.keypoint_detector = SuperPointForKeypointDetection(
            config.keypoint_detector_config, **kw)
        self.keypoint_encoder = SuperGlueKeypointEncoder(config, **kw)
        self.gnn = SuperGlueAttentionalGNN(config, **kw)
        self.final_projection = _SGFinalProjection(config, **kw)

    def init(self, rng):
        params = super().init(rng)
        params["bin_score"] = jnp.asarray(1.0, self.param_dtype)
        return params

    def __call__(self, params, pixel_values, **kwargs) -> SuperGlueKeypointMatchingOutput:
        b, two, c, height, width = pixel_values.shape
        flat = pixel_values.reshape(b * 2, c, height, width)
        det = self.keypoint_detector(params["keypoint_detector"], flat)
        k = det.keypoints.shape[1]
        rel_keypoints = det.keypoints.reshape(b, 2, k, 2)
        mask = det.mask.reshape(b * 2, k)

        abs_kp = det.keypoints * jnp.asarray([width, height], jnp.float32)
        kp_norm = normalize_keypoints(abs_kp, height, width)  # [B*2, K, 2]
        descriptors = det.descriptors + self.keypoint_encoder(
            params["keypoint_encoder"], kp_norm, det.scores)
        descriptors = self.gnn(params["gnn"], descriptors, mask)
        projected = self.final_projection(params["final_projection"], descriptors)

        d = projected.reshape(b, 2, k, -1)
        scores = jnp.einsum("bnd,bmd->bnm", d[:, 0], d[:, 1],
                            preferred_element_type=jnp.float32)
        scores = scores / self.config.hidden_size**0.5
        pair_mask = (mask.reshape(b, 2, k)[:, 0, :, None].astype(bool)
                     & mask.reshape(b, 2, k)[:, 1, None, :].astype(bool))
        scores = jnp.where(pair_mask, scores, jnp.finfo(jnp.float32).min)

        ot = log_optimal_transport(scores, params["bin_score"].astype(jnp.float32),
                                   self.config.sinkhorn_iterations)
        inner = ot[:, :-1, :-1]
        max0 = inner.max(axis=2)
        idx0 = inner.argmax(axis=2)
        max1 = inner.max(axis=1)
        idx1 = inner.argmax(axis=1)
        ar = jnp.arange(k)[None]
        mutual0 = ar == jnp.take_along_axis(idx1, idx0, axis=1)
        mutual1 = ar == jnp.take_along_axis(idx0, idx1, axis=1)
        ms0 = jnp.where(mutual0, jnp.exp(max0), 0.0)
        ms0 = jnp.where(ms0 > self.config.matching_threshold, ms0, 0.0)
        ms1 = jnp.where(mutual1, jnp.take_along_axis(ms0, idx1, axis=1), 0.0)
        valid0 = mutual0 & (ms0 > 0)
        valid1 = mutual1 & jnp.take_along_axis(valid0, idx1, axis=1)
        matches0 = jnp.where(valid0, idx0, -1)
        matches1 = jnp.where(valid1, idx1, -1)

        matches = jnp.stack([matches0, matches1], axis=1)
        matching_scores = jnp.stack([ms0, ms1], axis=1)
        return SuperGlueKeypointMatchingOutput(
            matches=matches, matching_scores=matching_scores,
            keypoints=rel_keypoints, mask=mask.reshape(b, 2, k))
