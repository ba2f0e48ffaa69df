"""RT-DETR — real-time detection transformer, TPU-native (reference
src/transformers/models/rt_detr/modeling_rt_detr.py and
modeling_rt_detr_resnet.py).

Deep-stem ResNet-D backbone (:modeling_rt_detr_resnet), hybrid encoder =
AIFI transformer on the coarsest level + FPN/PAN CSP-RepVGG fusion (:1064),
two-stage query selection over anchor logits (:1650), and a deformable-
attention decoder with iterative box refinement (:1185) built on
ops/deformable.multi_scale_deformable_attention. Inference path; the
contrastive-denoising training group and varifocal loss are training-only
machinery not yet wired (labels raise NotImplementedError)."""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core.loading import WeightRule
from ...core.module import BatchNorm, Conv, Embedding, LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import ModelOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...ops.deformable import multi_scale_deformable_attention
from .configuration_rt_detr import RTDetrConfig, RTDetrResNetConfig


@dataclass
class RTDetrModelOutput(ModelOutput):
    last_hidden_state: Optional[jnp.ndarray] = None
    intermediate_hidden_states: Optional[jnp.ndarray] = None
    intermediate_logits: Optional[jnp.ndarray] = None
    intermediate_reference_points: Optional[jnp.ndarray] = None
    enc_topk_logits: Optional[jnp.ndarray] = None
    enc_topk_bboxes: Optional[jnp.ndarray] = None


@dataclass
class RTDetrObjectDetectionOutput(ModelOutput):
    loss: Optional[jnp.ndarray] = None
    logits: Optional[jnp.ndarray] = None
    pred_boxes: Optional[jnp.ndarray] = None
    last_hidden_state: Optional[jnp.ndarray] = None
    enc_topk_logits: Optional[jnp.ndarray] = None
    enc_topk_bboxes: Optional[jnp.ndarray] = None


class _Seq2(Module):
    """torch nn.Sequential(conv, norm) with literal '0'/'1' child keys."""

    def __init__(self, conv, norm, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        setattr(self, "0", conv)
        setattr(self, "1", norm)

    def __call__(self, params, x):
        x = getattr(self, "0")(params["0"], x)
        return getattr(self, "1")(params["1"], x)


# --------------------------------------------------------------- backbone
class RTDetrResNetConvLayer(Module):
    def __init__(self, in_ch, out_ch, kernel_size=3, stride=1, activation="relu",
                 *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.convolution = Conv(in_ch, out_ch, kernel_size, stride=stride,
                                padding=kernel_size // 2, use_bias=False, ndim=2, **kw)
        self.normalization = BatchNorm(out_ch, **kw)
        self.act = get_activation(activation) if activation else None

    def __call__(self, params, x):
        x = self.normalization(params["normalization"],
                               self.convolution(params["convolution"], x))
        return self.act(x) if self.act else x


class RTDetrResNetShortCut(Module):
    def __init__(self, in_ch, out_ch, stride=2, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.convolution = Conv(in_ch, out_ch, 1, stride=stride, use_bias=False,
                                ndim=2, **kw)
        self.normalization = BatchNorm(out_ch, **kw)

    def __call__(self, params, x):
        return self.normalization(params["normalization"],
                                  self.convolution(params["convolution"], x))


def _avg_pool_2x2_ceil(x):
    """nn.AvgPool2d(2, 2, 0, ceil_mode=True)."""
    h, w = x.shape[2], x.shape[3]
    pad_h, pad_w = h % 2, w % 2
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad_h), (0, pad_w)))
        # ceil_mode averages only over valid elements: scale edge windows
    pooled = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 1, 2, 2), (1, 1, 2, 2),
                                   "VALID")
    ones = jnp.ones((1, 1, h, w), x.dtype)
    if pad_h or pad_w:
        ones = jnp.pad(ones, ((0, 0), (0, 0), (0, pad_h), (0, pad_w)))
    counts = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, 1, 2, 2), (1, 1, 2, 2),
                                   "VALID")
    return pooled / counts


class _ShortcutSeq(Module):
    """Sequential(AvgPool2d, ShortCut) — pool is param-free at torch index 0,
    shortcut at index 1."""

    def __init__(self, in_ch, out_ch, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        setattr(self, "1", RTDetrResNetShortCut(in_ch, out_ch, stride=1,
                                                dtype=dtype, param_dtype=param_dtype))

    def __call__(self, params, x):
        return getattr(self, "1")(params["1"], _avg_pool_2x2_ceil(x))


class RTDetrResNetBasicLayer(Module):
    def __init__(self, config, in_ch, out_ch, stride=1, should_apply_shortcut=False,
                 *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        if in_ch != out_ch and should_apply_shortcut:
            self.shortcut = _ShortcutSeq(in_ch, out_ch, **kw)
        elif should_apply_shortcut:
            self.shortcut = RTDetrResNetShortCut(in_ch, out_ch, stride=stride, **kw)
        else:
            self.shortcut = None
        self.layer = [RTDetrResNetConvLayer(in_ch, out_ch, stride=stride,
                                            activation=config.hidden_act, **kw),
                      RTDetrResNetConvLayer(out_ch, out_ch, activation=None, **kw)]
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, x):
        residual = x
        h = self.layer[0](params["layer"]["0"], x)
        h = self.layer[1](params["layer"]["1"], h)
        if self.shortcut is not None:
            residual = self.shortcut(params["shortcut"], residual)
        return self.act(h + residual)


class RTDetrResNetBottleNeckLayer(Module):
    def __init__(self, config, in_ch, out_ch, stride=1, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        should_apply = in_ch != out_ch or stride != 1
        reduced = out_ch // 4
        if stride == 2:
            self.shortcut = _ShortcutSeq(in_ch, out_ch, **kw) if should_apply else "pool"
        else:
            self.shortcut = (RTDetrResNetShortCut(in_ch, out_ch, stride=stride, **kw)
                             if should_apply else None)
        db = config.downsample_in_bottleneck
        self.layer = [
            RTDetrResNetConvLayer(in_ch, reduced, 1, stride=stride if db else 1,
                                  activation=config.hidden_act, **kw),
            RTDetrResNetConvLayer(reduced, reduced, stride=stride if not db else 1,
                                  activation=config.hidden_act, **kw),
            RTDetrResNetConvLayer(reduced, out_ch, 1, activation=None, **kw)]
        self.act = get_activation(config.hidden_act)
        self.stride = stride

    def __call__(self, params, x):
        residual = x
        h = x
        for i, layer in enumerate(self.layer):
            h = layer(params["layer"][str(i)], h)
        if self.shortcut == "pool":
            residual = _avg_pool_2x2_ceil(residual)
        elif self.shortcut is not None:
            residual = self.shortcut(params["shortcut"], residual)
        return self.act(h + residual)


class RTDetrResNetStage(Module):
    def __init__(self, config, in_ch, out_ch, stride=2, depth=2, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        bottleneck = config.layer_type == "bottleneck"
        if bottleneck:
            first = RTDetrResNetBottleNeckLayer(config, in_ch, out_ch, stride=stride, **kw)
            rest = [RTDetrResNetBottleNeckLayer(config, out_ch, out_ch, **kw)
                    for _ in range(depth - 1)]
        else:
            first = RTDetrResNetBasicLayer(config, in_ch, out_ch, stride=stride,
                                           should_apply_shortcut=True, **kw)
            rest = [RTDetrResNetBasicLayer(config, out_ch, out_ch, **kw)
                    for _ in range(depth - 1)]
        self.layers = [first] + rest

    def __call__(self, params, x):
        for i, layer in enumerate(self.layers):
            x = layer(params["layers"][str(i)], x)
        return x


class RTDetrResNetEmbeddings(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        e = config.embedding_size
        self.embedder = [
            RTDetrResNetConvLayer(config.num_channels, e // 2, 3, stride=2,
                                  activation=config.hidden_act, **kw),
            RTDetrResNetConvLayer(e // 2, e // 2, 3, activation=config.hidden_act, **kw),
            RTDetrResNetConvLayer(e // 2, e, 3, activation=config.hidden_act, **kw)]

    def __call__(self, params, x):
        for i, layer in enumerate(self.embedder):
            x = layer(params["embedder"][str(i)], x)
        # MaxPool2d(3, 2, padding=1)
        x = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)),
                    constant_values=-jnp.inf)
        return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 1, 3, 3),
                                     (1, 1, 2, 2), "VALID")


class RTDetrResNetBackbone(Module):
    """Stages + out_indices feature maps (reference modeling_rt_detr_resnet)."""

    def __init__(self, config: RTDetrResNetConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.embedder = RTDetrResNetEmbeddings(config, **kw)
        stages = [RTDetrResNetStage(
            config, config.embedding_size, config.hidden_sizes[0],
            stride=2 if config.downsample_in_first_stage else 1,
            depth=config.depths[0], **kw)]
        for (in_ch, out_ch), depth in zip(
                zip(config.hidden_sizes, config.hidden_sizes[1:]), config.depths[1:]):
            stages.append(RTDetrResNetStage(config, in_ch, out_ch, depth=depth, **kw))
        self.encoder = _ResNetEncoder(stages, dtype=dtype, param_dtype=param_dtype)
        self.channels = [([config.embedding_size] + config.hidden_sizes)[i]
                         for i in config.out_indices]

    def __call__(self, params, pixel_values):
        h = self.embedder(params["embedder"], pixel_values)
        hidden_states = [h]
        for i, stage in enumerate(self.encoder.stages):
            h = stage(params["encoder"]["stages"][str(i)], h)
            hidden_states.append(h)
        return [hidden_states[i] for i in self.config.out_indices]


class _ResNetEncoder(Module):
    def __init__(self, stages, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.stages = stages


# --------------------------------------------------------- hybrid encoder
class RTDetrConvNormLayer(Module):
    def __init__(self, config, in_ch, out_ch, kernel_size, stride, padding=None,
                 activation=None, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.conv = Conv(in_ch, out_ch, kernel_size, stride=stride,
                         padding=(kernel_size - 1) // 2 if padding is None else padding,
                         use_bias=False, ndim=2, **kw)
        self.norm = BatchNorm(out_ch, config.batch_norm_eps, **kw)
        self.act = get_activation(activation) if activation else None

    def __call__(self, params, x):
        x = self.norm(params["norm"], self.conv(params["conv"], x))
        return self.act(x) if self.act else x


class RTDetrRepVggBlock(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        c = int(config.encoder_hidden_dim * config.hidden_expansion)
        self.conv1 = RTDetrConvNormLayer(config, c, c, 3, 1, padding=1, **kw)
        self.conv2 = RTDetrConvNormLayer(config, c, c, 1, 1, padding=0, **kw)
        self.act = get_activation(config.activation_function)

    def __call__(self, params, x):
        return self.act(self.conv1(params["conv1"], x) + self.conv2(params["conv2"], x))


class RTDetrCSPRepLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        in_ch = config.encoder_hidden_dim * 2
        out_ch = config.encoder_hidden_dim
        hidden = int(out_ch * config.hidden_expansion)
        act = config.activation_function
        self.conv1 = RTDetrConvNormLayer(config, in_ch, hidden, 1, 1, activation=act, **kw)
        self.conv2 = RTDetrConvNormLayer(config, in_ch, hidden, 1, 1, activation=act, **kw)
        self.bottlenecks = [RTDetrRepVggBlock(config, **kw) for _ in range(3)]
        self.conv3 = (RTDetrConvNormLayer(config, hidden, out_ch, 1, 1, activation=act, **kw)
                      if hidden != out_ch else None)

    def __call__(self, params, x):
        h1 = self.conv1(params["conv1"], x)
        for i, blk in enumerate(self.bottlenecks):
            h1 = blk(params["bottlenecks"][str(i)], h1)
        h2 = self.conv2(params["conv2"], x)
        out = h1 + h2
        if self.conv3 is not None:
            out = self.conv3(params["conv3"], out)
        return out


class RTDetrSelfAttention(Module):
    """Positions added to q and k, not v (reference :308)."""

    def __init__(self, config, hidden_size, num_heads, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.heads = num_heads
        self.head_dim = hidden_size // num_heads
        self.q_proj = Linear(hidden_size, hidden_size, **kw)
        self.k_proj = Linear(hidden_size, hidden_size, **kw)
        self.v_proj = Linear(hidden_size, hidden_size, **kw)
        self.o_proj = Linear(hidden_size, hidden_size, **kw)

    def __call__(self, params, hidden, position_embeddings=None, attn_bias=None):
        b, s, d = hidden.shape
        qk_in = hidden + position_embeddings if position_embeddings is not None else hidden
        split = lambda x: jnp.swapaxes(x.reshape(b, s, self.heads, self.head_dim), 1, 2)
        q = split(self.q_proj(params["q_proj"], qk_in))
        k = split(self.k_proj(params["k_proj"], qk_in))
        v = split(self.v_proj(params["v_proj"], hidden))
        w = jnp.einsum("bhtd,bhsd->bhts", q, k) * self.head_dim**-0.5
        if attn_bias is not None:
            w = w + attn_bias
        p = jax.nn.softmax(w, axis=-1)
        out = jnp.swapaxes(jnp.einsum("bhts,bhsd->bhtd", p, v), 1, 2).reshape(b, s, d)
        return self.o_proj(params["o_proj"], out)


class RTDetrMLP(Module):
    def __init__(self, config, hidden_size, intermediate_size, activation,
                 *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.fc1 = Linear(hidden_size, intermediate_size, **kw)
        self.fc2 = Linear(intermediate_size, hidden_size, **kw)
        self.act = get_activation(activation)

    def __call__(self, params, x):
        return self.fc2(params["fc2"], self.act(self.fc1(params["fc1"], x)))


class RTDetrEncoderLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        h = config.encoder_hidden_dim
        self.normalize_before = config.normalize_before
        self.self_attn = RTDetrSelfAttention(config, h, config.num_attention_heads, **kw)
        self.self_attn_layer_norm = LayerNorm(h, config.layer_norm_eps, **kw)
        self.mlp = RTDetrMLP(config, h, config.encoder_ffn_dim,
                             config.encoder_activation_function, **kw)
        self.final_layer_norm = LayerNorm(h, config.layer_norm_eps, **kw)

    def __call__(self, params, hidden, pos_embed=None):
        residual = hidden
        if self.normalize_before:
            hidden = self.self_attn_layer_norm(params["self_attn_layer_norm"], hidden)
        hidden = self.self_attn(params["self_attn"], hidden, pos_embed)
        hidden = residual + hidden
        if not self.normalize_before:
            hidden = self.self_attn_layer_norm(params["self_attn_layer_norm"], hidden)
        if self.normalize_before:
            hidden = self.final_layer_norm(params["final_layer_norm"], hidden)
        residual = hidden
        hidden = residual + self.mlp(params["mlp"], hidden)
        if not self.normalize_before:
            hidden = self.final_layer_norm(params["final_layer_norm"], hidden)
        return hidden


def build_2d_sinusoidal_position_embedding(height, width, embed_dim, temperature):
    """reference :829 ([sin_h | cos_h | sin_w | cos_w], float64 internally)."""
    pos_dim = embed_dim // 4
    omega = np.arange(pos_dim, dtype=np.float64) / pos_dim
    omega = 1.0 / temperature**omega
    grid_h, grid_w = np.meshgrid(np.arange(height, dtype=np.float64),
                                 np.arange(width, dtype=np.float64), indexing="ij")
    emb_h = np.outer(grid_h.flatten(), omega)
    emb_w = np.outer(grid_w.flatten(), omega)
    pos = np.concatenate([np.sin(emb_h), np.cos(emb_h),
                          np.sin(emb_w), np.cos(emb_w)], axis=1)
    return jnp.asarray(pos, jnp.float32)


class RTDetrAIFILayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.layers = [RTDetrEncoderLayer(config, dtype=dtype, param_dtype=param_dtype)
                       for _ in range(config.encoder_layers)]

    def __call__(self, params, feature_map):
        b, c, h, w = feature_map.shape
        hidden = jnp.swapaxes(feature_map.reshape(b, c, h * w), 1, 2)
        pos = build_2d_sinusoidal_position_embedding(
            h, w, self.config.encoder_hidden_dim,
            self.config.positional_encoding_temperature)[None]
        for i, layer in enumerate(self.layers):
            hidden = layer(params["layers"][str(i)], hidden, pos.astype(hidden.dtype))
        return jnp.swapaxes(hidden, 1, 2).reshape(b, c, h, w)


class RTDetrHybridEncoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        n = len(config.encoder_in_channels)
        self.aifi = [RTDetrAIFILayer(config, **kw)
                     for _ in range(len(config.encode_proj_layers))]
        self.lateral_convs = [RTDetrConvNormLayer(
            config, config.encoder_hidden_dim, config.encoder_hidden_dim, 1, 1,
            activation=config.activation_function, **kw) for _ in range(n - 1)]
        self.fpn_blocks = [RTDetrCSPRepLayer(config, **kw) for _ in range(n - 1)]
        self.downsample_convs = [RTDetrConvNormLayer(
            config, config.encoder_hidden_dim, config.encoder_hidden_dim, 3, 2,
            activation=config.activation_function, **kw) for _ in range(n - 1)]
        self.pan_blocks = [RTDetrCSPRepLayer(config, **kw) for _ in range(n - 1)]

    def __call__(self, params, feature_maps):
        feature_maps = list(feature_maps)
        if self.config.encoder_layers > 0:
            for i, enc_ind in enumerate(self.config.encode_proj_layers):
                feature_maps[enc_ind] = self.aifi[i](params["aifi"][str(i)],
                                                     feature_maps[enc_ind])
        n_stages = len(feature_maps) - 1
        fpn = [feature_maps[-1]]
        for idx in range(n_stages):
            backbone_map = feature_maps[n_stages - idx - 1]
            top = self.lateral_convs[idx](params["lateral_convs"][str(idx)], fpn[-1])
            fpn[-1] = top
            b, c, h, w = top.shape
            up = jax.image.resize(top, (b, c, 2 * h, 2 * w), method="nearest")
            fused = jnp.concatenate([up, backbone_map], axis=1)
            fpn.append(self.fpn_blocks[idx](params["fpn_blocks"][str(idx)], fused))
        fpn.reverse()
        pan = [fpn[0]]
        for idx in range(n_stages):
            down = self.downsample_convs[idx](params["downsample_convs"][str(idx)],
                                              pan[-1])
            fused = jnp.concatenate([down, fpn[idx + 1]], axis=1)
            pan.append(self.pan_blocks[idx](params["pan_blocks"][str(idx)], fused))
        return pan


# ---------------------------------------------------------------- decoder
def inverse_sigmoid(x, eps=1e-5):
    x = jnp.clip(x, 0, 1)
    return jnp.log(jnp.clip(x, eps, None) / jnp.clip(1 - x, eps, None))


class RTDetrMultiscaleDeformableAttention(Module):
    def __init__(self, config, num_heads, n_points, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.d_model
        self.d_model = d
        self.n_levels = config.num_feature_levels
        self.n_heads = num_heads
        self.n_points = n_points
        self.sampling_offsets = Linear(d, num_heads * self.n_levels * n_points * 2, **kw)
        self.attention_weights = Linear(d, num_heads * self.n_levels * n_points, **kw)
        self.value_proj = Linear(d, d, **kw)
        self.output_proj = Linear(d, d, **kw)

    def __call__(self, params, hidden, encoder_hidden, reference_points,
                 spatial_shapes, position_embeddings=None):
        if position_embeddings is not None:
            hidden = hidden + position_embeddings
        b, q, _ = hidden.shape
        s = encoder_hidden.shape[1]
        value = self.value_proj(params["value_proj"], encoder_hidden)
        value = value.reshape(b, s, self.n_heads, self.d_model // self.n_heads)
        offsets = self.sampling_offsets(params["sampling_offsets"], hidden).reshape(
            b, q, self.n_heads, self.n_levels, self.n_points, 2)
        weights = self.attention_weights(params["attention_weights"], hidden).reshape(
            b, q, self.n_heads, self.n_levels * self.n_points)
        weights = jax.nn.softmax(weights, axis=-1).reshape(
            b, q, self.n_heads, self.n_levels, self.n_points)
        if reference_points.shape[-1] == 2:
            normalizer = jnp.asarray([[wd, ht] for ht, wd in spatial_shapes],
                                     jnp.float32)
            locations = (reference_points[:, :, None, :, None, :]
                         + offsets / normalizer[None, None, None, :, None, :])
        else:
            locations = (reference_points[:, :, None, :, None, :2]
                         + offsets / self.n_points
                         * reference_points[:, :, None, :, None, 2:] * 0.5)
        out = multi_scale_deformable_attention(value, spatial_shapes, locations,
                                               weights)
        return self.output_proj(params["output_proj"], out)


class RTDetrMLPPredictionHead(Module):
    def __init__(self, input_dim, hidden_dim, output_dim, num_layers,
                 *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        dims = [input_dim] + [hidden_dim] * (num_layers - 1)
        outs = [hidden_dim] * (num_layers - 1) + [output_dim]
        self.layers = [Linear(i, o, dtype=dtype, param_dtype=param_dtype)
                       for i, o in zip(dims, outs)]

    def __call__(self, params, x):
        n = len(self.layers)
        for i, layer in enumerate(self.layers):
            x = layer(params["layers"][str(i)], x)
            if i < n - 1:
                x = jax.nn.relu(x)
        return x


class RTDetrDecoderLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.d_model
        self.self_attn = RTDetrSelfAttention(config, d, config.decoder_attention_heads, **kw)
        self.self_attn_layer_norm = LayerNorm(d, config.layer_norm_eps, **kw)
        self.encoder_attn = RTDetrMultiscaleDeformableAttention(
            config, config.decoder_attention_heads, config.decoder_n_points, **kw)
        self.encoder_attn_layer_norm = LayerNorm(d, config.layer_norm_eps, **kw)
        self.mlp = RTDetrMLP(config, d, config.decoder_ffn_dim,
                             config.decoder_activation_function, **kw)
        self.final_layer_norm = LayerNorm(d, config.layer_norm_eps, **kw)

    def __call__(self, params, hidden, query_pos, reference_points,
                 spatial_shapes, encoder_hidden):
        residual = hidden
        hidden = self.self_attn(params["self_attn"], hidden, query_pos)
        hidden = self.self_attn_layer_norm(params["self_attn_layer_norm"],
                                           residual + hidden)
        residual = hidden
        hidden = self.encoder_attn(params["encoder_attn"], hidden, encoder_hidden,
                                   reference_points, spatial_shapes, query_pos)
        hidden = self.encoder_attn_layer_norm(params["encoder_attn_layer_norm"],
                                              residual + hidden)
        residual = hidden
        hidden = self.final_layer_norm(params["final_layer_norm"],
                                       residual + self.mlp(params["mlp"], hidden))
        return hidden


class RTDetrDecoder(Module):
    def __init__(self, config, with_heads=False, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.layers = [RTDetrDecoderLayer(config, **kw)
                       for _ in range(config.decoder_layers)]
        self.query_pos_head = RTDetrMLPPredictionHead(4, 2 * config.d_model,
                                                      config.d_model, 2, **kw)
        if with_heads:
            self.class_embed = [Linear(config.d_model, config.num_labels, **kw)
                                for _ in range(config.decoder_layers)]
            self.bbox_embed = [RTDetrMLPPredictionHead(config.d_model, config.d_model,
                                                       4, 3, **kw)
                               for _ in range(config.decoder_layers)]
        else:
            self.class_embed = None
            self.bbox_embed = None

    def __call__(self, params, target, encoder_hidden, reference_points_unact,
                 spatial_shapes):
        hidden = target
        reference_points = jax.nn.sigmoid(reference_points_unact)
        intermediate, inter_refs, inter_logits = [], [], []
        for idx, layer in enumerate(self.layers):
            ref_input = reference_points[:, :, None]
            query_pos = self.query_pos_head(params["query_pos_head"], reference_points)
            hidden = layer(params["layers"][str(idx)], hidden, query_pos, ref_input,
                           spatial_shapes, encoder_hidden)
            if self.bbox_embed is not None:
                corners = self.bbox_embed[idx](params["bbox_embed"][str(idx)], hidden)
                reference_points = jax.nn.sigmoid(
                    corners + inverse_sigmoid(reference_points))
            intermediate.append(hidden)
            inter_refs.append(reference_points)
            if self.class_embed is not None:
                inter_logits.append(self.class_embed[idx](
                    params["class_embed"][str(idx)], hidden))
        return (hidden, jnp.stack(intermediate, 1), jnp.stack(inter_refs, 1),
                jnp.stack(inter_logits, 1) if inter_logits else None)


class RTDetrPreTrainedModel(PreTrainedModel):
    config_class = RTDetrConfig
    base_model_prefix = "model"
    main_input_name = "pixel_values"
    _keys_to_ignore_on_load_unexpected = (r"num_batches_tracked$",)
    # hub checkpoints use the pre-v5 key layout (reference
    # conversion_mapping.py:1042 "rt_detr")
    _weight_rules = (
        WeightRule(pattern=r"out_proj", rename="o_proj",
                   save_pattern=r"o_proj", save_rename="out_proj"),
        WeightRule(pattern=r"layers\.(\d+)\.fc1", rename=r"layers.\1.mlp.fc1",
                   save_pattern=r"layers\.(\d+)\.mlp\.fc1",
                   save_rename=r"layers.\1.fc1"),
        WeightRule(pattern=r"layers\.(\d+)\.fc2", rename=r"layers.\1.mlp.fc2",
                   save_pattern=r"layers\.(\d+)\.mlp\.fc2",
                   save_rename=r"layers.\1.fc2"),
        WeightRule(pattern=r"encoder\.encoder\.(\d+)\.layers",
                   rename=r"encoder.aifi.\1.layers",
                   save_pattern=r"encoder\.aifi\.(\d+)\.layers",
                   save_rename=r"encoder.encoder.\1.layers"),
    )


class _RTDetrCore(Module):
    def __init__(self, config, with_heads=False, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.backbone = _BackboneWrap(config.backbone_config, **kw)
        self.encoder_input_proj = [
            _Seq2(Conv(ch, config.encoder_hidden_dim, 1, use_bias=False, ndim=2, **kw),
                  BatchNorm(config.encoder_hidden_dim, **kw), **kw)
            for ch in self.backbone.model.channels]
        self.encoder = RTDetrHybridEncoder(config, **kw)
        if config.num_denoising > 0:
            self.denoising_class_embed = Embedding(
                config.num_labels + 1, config.d_model,
                embedding_init=normal_init(0.02), **kw)
        if config.learn_initial_query:
            self.weight_embedding = Embedding(config.num_queries, config.d_model,
                                              embedding_init=normal_init(0.02), **kw)
        self.enc_output = _Seq2(Linear(config.d_model, config.d_model, **kw),
                                LayerNorm(config.d_model, config.layer_norm_eps, **kw),
                                **kw)
        self.enc_score_head = Linear(config.d_model, config.num_labels, **kw)
        self.enc_bbox_head = RTDetrMLPPredictionHead(config.d_model, config.d_model,
                                                     4, 3, **kw)
        n_backbone = len(config.decoder_in_channels)
        projs = [
            _Seq2(Conv(ch, config.d_model, 1, use_bias=False, ndim=2, **kw),
                  BatchNorm(config.d_model, config.batch_norm_eps, **kw), **kw)
            for ch in config.decoder_in_channels]
        in_ch = config.decoder_in_channels[-1]
        for _ in range(config.num_feature_levels - n_backbone):
            projs.append(_Seq2(
                Conv(in_ch, config.d_model, 3, stride=2, padding=1, use_bias=False,
                     ndim=2, **kw),
                BatchNorm(config.d_model, config.batch_norm_eps, **kw), **kw))
            in_ch = config.d_model
        self.decoder_input_proj = projs
        self.decoder = RTDetrDecoder(config, with_heads=with_heads, **kw)

    def generate_anchors(self, spatial_shapes, grid_size=0.05):
        anchors = []
        for level, (h, w) in enumerate(spatial_shapes):
            gy, gx = np.meshgrid(np.arange(h, dtype=np.float32),
                                 np.arange(w, dtype=np.float32), indexing="ij")
            gxy = (np.stack([gx, gy], -1)[None] + 0.5)
            gxy[..., 0] /= w
            gxy[..., 1] /= h
            wh = np.ones_like(gxy) * grid_size * (2.0**level)
            anchors.append(np.concatenate([gxy, wh], -1).reshape(1, h * w, 4))
        anchors = np.concatenate(anchors, 1)
        eps = 1e-2
        valid = ((anchors > eps) & (anchors < 1 - eps)).all(-1, keepdims=True)
        anchors = np.log(anchors / (1 - anchors))
        anchors = np.where(valid, anchors, np.finfo(np.float32).max)
        return jnp.asarray(anchors, jnp.float32), jnp.asarray(valid)

    def __call__(self, params, pixel_values):
        features = self.backbone.model(params["backbone"]["model"], pixel_values)
        proj_feats = [self.encoder_input_proj[i](params["encoder_input_proj"][str(i)], f)
                      for i, f in enumerate(features)]
        pan = self.encoder(params["encoder"], proj_feats)

        sources = [self.decoder_input_proj[i](params["decoder_input_proj"][str(i)], s)
                   for i, s in enumerate(pan)]
        if self.config.num_feature_levels > len(sources):
            i = len(sources)
            sources.append(self.decoder_input_proj[i](
                params["decoder_input_proj"][str(i)], pan[-1]))
            for j in range(i + 1, self.config.num_feature_levels):
                sources.append(self.decoder_input_proj[j](
                    params["decoder_input_proj"][str(j)], sources[-1]))

        spatial_shapes = [(s.shape[2], s.shape[3]) for s in sources]
        flat = jnp.concatenate(
            [jnp.swapaxes(s.reshape(s.shape[0], s.shape[1], -1), 1, 2)
             for s in sources], axis=1)

        anchors, valid_mask = self.generate_anchors(spatial_shapes)
        memory = valid_mask.astype(flat.dtype) * flat
        output_memory = self.enc_output(params["enc_output"], memory)
        enc_class = self.enc_score_head(params["enc_score_head"], output_memory)
        enc_coord = self.enc_bbox_head(params["enc_bbox_head"], output_memory) + anchors

        topk = self.config.num_queries
        _, topk_ind = jax.lax.top_k(jnp.max(enc_class, -1), topk)
        gather = lambda x: jnp.take_along_axis(
            x, topk_ind[..., None].repeat(x.shape[-1], -1), axis=1)
        reference_points_unact = gather(enc_coord)
        enc_topk_bboxes = jax.nn.sigmoid(reference_points_unact)
        enc_topk_logits = gather(enc_class)

        if self.config.learn_initial_query:
            target = jnp.tile(params["weight_embedding"]["weight"][None]
                              .astype(flat.dtype), (flat.shape[0], 1, 1))
        else:
            target = jax.lax.stop_gradient(gather(output_memory))

        out = self.decoder(params["decoder"], target, flat,
                           jax.lax.stop_gradient(reference_points_unact),
                           spatial_shapes)
        last, intermediate, inter_refs, inter_logits = out
        return RTDetrModelOutput(
            last_hidden_state=last,
            intermediate_hidden_states=intermediate,
            intermediate_logits=inter_logits,
            intermediate_reference_points=inter_refs,
            enc_topk_logits=enc_topk_logits,
            enc_topk_bboxes=enc_topk_bboxes)


class _BackboneWrap(Module):
    """RTDetrConvEncoder: `backbone.model.*` key layout (reference :398)."""

    def __init__(self, backbone_config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.model = RTDetrResNetBackbone(backbone_config, dtype=dtype,
                                          param_dtype=param_dtype)


class RTDetrModel(RTDetrPreTrainedModel):
    def __init__(self, config: RTDetrConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        core = _RTDetrCore(config, with_heads=False, dtype=self.dtype,
                           param_dtype=self.param_dtype)
        # expose the core's children at top level so checkpoint keys resolve
        # module-tree transforms (Linear transpose) without a wrapper prefix
        for name, child in core.children.items():
            setattr(self, name, child)
        object.__setattr__(self, "_core", core)

    def __call__(self, params, pixel_values=None, labels=None, **kwargs):
        if labels is not None:
            raise NotImplementedError("RT-DETR training loss not wired yet")
        return self._core(params, pixel_values)


class RTDetrForObjectDetection(RTDetrPreTrainedModel):
    def __init__(self, config: RTDetrConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.model = _RTDetrCore(config, with_heads=True, dtype=self.dtype,
                                 param_dtype=self.param_dtype)

    def __call__(self, params, pixel_values=None, labels=None, **kwargs):
        if labels is not None:
            raise NotImplementedError("RT-DETR training loss not wired yet")
        out = self.model(params["model"], pixel_values)
        logits = out.intermediate_logits[:, -1]
        pred_boxes = out.intermediate_reference_points[:, -1]
        return RTDetrObjectDetectionOutput(
            logits=logits, pred_boxes=pred_boxes,
            last_hidden_state=out.last_hidden_state,
            enc_topk_logits=out.enc_topk_logits,
            enc_topk_bboxes=out.enc_topk_bboxes)
