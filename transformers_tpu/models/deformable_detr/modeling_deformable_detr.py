"""Deformable DETR, TPU-native.

Semantics match reference
src/transformers/models/deformable_detr/modeling_deformable_detr.py:
multi-scale ResNet features + extra stride-2 conv levels, each projected by a
1x1 conv + GroupNorm(32) (:1160-1198), sine position embeddings with the
-0.5 offset (:393), per-level learned level_embed added to the flattened
positions (:1424), an encoder whose self-attention is multi-scale deformable
attention over grid-center reference points (:963-992), and a decoder that
mixes standard self-attention with deformable cross-attention while
(optionally) refining reference boxes layer by layer (:1084-1125). Single- and
two-stage query selection (:1453-1485) are both supported.

The CUDA MSDA kernel is replaced by ``ops.deformable.multi_scale_deformable_attention``
— a gather-based bilinear sampler that XLA fuses around one MXU einsum.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from ...core.loading import WeightRule
from ...core.module import Conv, Embedding, GroupNorm, LayerNorm, Linear, Module, normal_init
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...ops.attention import eager_attention
from ...ops.deformable import multi_scale_deformable_attention
from ...utils.generic import ModelOutput
from ..resnet.modeling_resnet import ResNetEmbeddings, ResNetEncoder
from .configuration_deformable_detr import DeformableDetrConfig


@dataclass
class DeformableDetrModelOutput(ModelOutput):
    init_reference_points: Any = None
    last_hidden_state: Any = None
    intermediate_hidden_states: Any = None
    intermediate_reference_points: Any = None
    encoder_last_hidden_state: Any = None
    enc_outputs_class: Any = None
    enc_outputs_coord_logits: Any = None


@dataclass
class DeformableDetrObjectDetectionOutput(ModelOutput):
    loss: Any = None
    loss_dict: Any = None
    logits: Any = None
    pred_boxes: Any = None
    auxiliary_outputs: Any = None
    last_hidden_state: Any = None
    init_reference_points: Any = None
    intermediate_hidden_states: Any = None
    intermediate_reference_points: Any = None
    encoder_last_hidden_state: Any = None
    enc_outputs_class: Any = None
    enc_outputs_coord_logits: Any = None


def inverse_sigmoid(x, eps=1e-5):
    x = jnp.clip(x, 0, 1)
    return jnp.log(jnp.clip(x, eps, None) / jnp.clip(1 - x, eps, None))


def sine_position_embedding(mask, num_pos_feats, temperature=10000.0):
    """reference DeformableDetrSinePositionEmbedding (:362-404, normalize=True):
    cumsum over the valid mask with a -0.5 center offset. mask: [B, H, W] float.
    Returns [B, H, W, 2*num_pos_feats]."""
    scale = 2 * math.pi
    eps = 1e-6
    y = jnp.cumsum(mask, axis=1)
    x = jnp.cumsum(mask, axis=2)
    y = (y - 0.5) / (y[:, -1:, :] + eps) * scale
    x = (x - 0.5) / (x[:, :, -1:] + eps) * scale
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * jnp.floor(dim_t / 2) / num_pos_feats)
    pos_x = x[..., None] / dim_t
    pos_y = y[..., None] / dim_t
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])],
                      axis=-1).reshape(*pos_x.shape[:-1], -1)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])],
                      axis=-1).reshape(*pos_y.shape[:-1], -1)
    return jnp.concatenate([pos_y, pos_x], axis=-1)


class DeformableDetrConvEncoder(Module):
    """ResNet backbone returning the ``out_features`` stage maps (reference
    :289-338; the AutoBackbone's params live directly at embedder/encoder)."""

    def __init__(self, config: DeformableDetrConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        bc = config.backbone_config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        model = Module(**kw)
        model._children["embedder"] = ResNetEmbeddings(bc, **kw)
        model._children["encoder"] = ResNetEncoder(bc, **kw)
        self.model = model
        sizes = [bc.embedding_size] + list(bc.hidden_sizes)
        self.out_stages = [bc.stage_names.index(n) for n in bc.out_features]
        self.intermediate_channel_sizes = [sizes[i] for i in self.out_stages]

    def __call__(self, params, pixel_values):
        x = self.model._children["embedder"](params["model"]["embedder"],
                                             jnp.asarray(pixel_values, self.dtype))
        _, hidden_states = self.model._children["encoder"](params["model"]["encoder"], x)
        return [hidden_states[i] for i in self.out_stages]


class DeformableDetrMultiscaleDeformableAttention(Module):
    """reference :542-646."""

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
                 spatial_shapes, position_embeddings=None, value_valid=None):
        if position_embeddings is not None:
            hidden = hidden + position_embeddings
        b, q, _ = hidden.shape
        s = encoder_hidden.shape[1]
        value = self.value_proj(params["value_proj"], encoder_hidden)
        if value_valid is not None:
            value = value * value_valid[..., None].astype(value.dtype)
        value = value.reshape(b, s, self.n_heads, self.d_model // self.n_heads)
        offsets = self.sampling_offsets(params["sampling_offsets"], hidden).reshape(
            b, q, self.n_heads, self.n_levels, self.n_points, 2)
        weights = self.attention_weights(params["attention_weights"], hidden).reshape(
            b, q, self.n_heads, self.n_levels * self.n_points)
        weights = jax.nn.softmax(weights, axis=-1).reshape(
            b, q, self.n_heads, self.n_levels, self.n_points)
        if reference_points.shape[-1] == 2:
            normalizer = jnp.asarray([[wd, ht] for ht, wd in spatial_shapes], jnp.float32)
            locations = (reference_points[:, :, None, :, None, :]
                         + offsets / normalizer[None, None, None, :, None, :])
        else:
            locations = (reference_points[:, :, None, :, None, :2]
                         + offsets / self.n_points
                         * reference_points[:, :, None, :, None, 2:] * 0.5)
        out = multi_scale_deformable_attention(value, spatial_shapes, locations, weights)
        return self.output_proj(params["output_proj"], out)


class DeformableDetrSelfAttention(Module):
    """Standard MHA; position embeddings go into q AND k projections (:503-539)."""

    def __init__(self, config, hidden_size, num_heads, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.num_heads = num_heads
        self.head_dim = hidden_size // num_heads
        self.q_proj = Linear(hidden_size, hidden_size, True, **kw)
        self.k_proj = Linear(hidden_size, hidden_size, True, **kw)
        self.v_proj = Linear(hidden_size, hidden_size, True, **kw)
        self.o_proj = Linear(hidden_size, hidden_size, True, **kw)

    def __call__(self, params, hidden, position_embeddings=None):
        b, s, e = hidden.shape
        qk_in = hidden + position_embeddings if position_embeddings is not None else hidden
        q = self.q_proj(params["q_proj"], qk_in).reshape(b, s, self.num_heads, self.head_dim)
        k = self.k_proj(params["k_proj"], qk_in).reshape(b, s, self.num_heads, self.head_dim)
        v = self.v_proj(params["v_proj"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        out = eager_attention(q, k, v, scale=self.head_dim**-0.5, is_causal=False)
        return self.o_proj(params["o_proj"], out.reshape(b, s, e))


class DeformableDetrMLP(Module):
    def __init__(self, config, hidden_size, intermediate_size, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.fc1 = Linear(hidden_size, intermediate_size, True, **kw)
        self.fc2 = Linear(intermediate_size, hidden_size, True, **kw)
        self.act = get_activation(config.activation_function)

    def __call__(self, params, x):
        return self.fc2(params["fc2"], self.act(self.fc1(params["fc1"], x)))


class DeformableDetrEncoderLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.d_model
        self.self_attn = DeformableDetrMultiscaleDeformableAttention(
            config, config.encoder_attention_heads, config.encoder_n_points, **kw)
        self.self_attn_layer_norm = LayerNorm(d, **kw)
        self.mlp = DeformableDetrMLP(config, d, config.encoder_ffn_dim, **kw)
        self.final_layer_norm = LayerNorm(d, **kw)

    def __call__(self, params, hidden, pos, reference_points, spatial_shapes,
                 value_valid=None):
        h = self.self_attn(params["self_attn"], hidden, hidden, reference_points,
                           spatial_shapes, position_embeddings=pos,
                           value_valid=value_valid)
        hidden = self.self_attn_layer_norm(params["self_attn_layer_norm"], hidden + h)
        h = self.mlp(params["mlp"], hidden)
        return self.final_layer_norm(params["final_layer_norm"], hidden + h)


class DeformableDetrDecoderLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.d_model
        self.self_attn = DeformableDetrSelfAttention(
            config, d, config.decoder_attention_heads, **kw)
        self.self_attn_layer_norm = LayerNorm(d, **kw)
        self.encoder_attn = DeformableDetrMultiscaleDeformableAttention(
            config, config.decoder_attention_heads, config.decoder_n_points, **kw)
        self.encoder_attn_layer_norm = LayerNorm(d, **kw)
        self.mlp = DeformableDetrMLP(config, d, config.decoder_ffn_dim, **kw)
        self.final_layer_norm = LayerNorm(d, **kw)

    def __call__(self, params, hidden, query_pos, reference_points, spatial_shapes,
                 encoder_hidden, value_valid=None):
        h = self.self_attn(params["self_attn"], hidden, query_pos)
        hidden = self.self_attn_layer_norm(params["self_attn_layer_norm"], hidden + h)
        h = self.encoder_attn(params["encoder_attn"], hidden, encoder_hidden,
                              reference_points, spatial_shapes,
                              position_embeddings=query_pos, value_valid=value_valid)
        hidden = self.encoder_attn_layer_norm(params["encoder_attn_layer_norm"], hidden + h)
        h = self.mlp(params["mlp"], hidden)
        return self.final_layer_norm(params["final_layer_norm"], hidden + h)


def encoder_reference_points(spatial_shapes, valid_ratios):
    """Grid-center reference points per level, scaled by valid ratios
    (reference :963-992). Returns [B, S, L, 2]."""
    refs = []
    for level, (h, w) in enumerate(spatial_shapes):
        ref_y = (jnp.arange(h, dtype=jnp.float32) + 0.5)[:, None] * jnp.ones((1, w))
        ref_x = (jnp.arange(w, dtype=jnp.float32) + 0.5)[None, :] * jnp.ones((h, 1))
        ref_y = ref_y.reshape(-1)[None] / (valid_ratios[:, None, level, 1] * h)
        ref_x = ref_x.reshape(-1)[None] / (valid_ratios[:, None, level, 0] * w)
        refs.append(jnp.stack([ref_x, ref_y], -1))
    reference_points = jnp.concatenate(refs, 1)
    return reference_points[:, :, None] * valid_ratios[:, None]


class DeformableDetrEncoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.layers = [DeformableDetrEncoderLayer(config, dtype=dtype, param_dtype=param_dtype)
                       for _ in range(config.encoder_layers)]

    def __call__(self, params, hidden, pos, spatial_shapes, valid_ratios,
                 value_valid=None):
        reference_points = encoder_reference_points(spatial_shapes, valid_ratios)
        for i, layer in enumerate(self.layers):
            hidden = layer(params["layers"][str(i)], hidden, pos, reference_points,
                           spatial_shapes, value_valid)
        return hidden


class DeformableDetrDecoder(Module):
    """Returns per-layer intermediates and (optionally box-refined) reference
    points (reference :1040-1135). ``bbox_embed`` params are passed in by the
    detection head when ``with_box_refine`` (the reference's tied clones)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.layers = [DeformableDetrDecoderLayer(config, dtype=dtype, param_dtype=param_dtype)
                       for _ in range(config.decoder_layers)]

    def __call__(self, params, target, query_pos, encoder_hidden, reference_points,
                 spatial_shapes, valid_ratios, value_valid=None,
                 bbox_embed=None, bbox_embed_params=None):
        hidden = target
        intermediate, inter_refs = [], []
        for idx, layer in enumerate(self.layers):
            if reference_points.shape[-1] == 4:
                ref_input = (reference_points[:, :, None]
                             * jnp.concatenate([valid_ratios, valid_ratios], -1)[:, None])
            else:
                ref_input = reference_points[:, :, None] * valid_ratios[:, None]
            hidden = layer(params["layers"][str(idx)], hidden, query_pos, ref_input,
                           spatial_shapes, encoder_hidden, value_valid)
            if bbox_embed is not None:
                delta = bbox_embed(bbox_embed_params[str(idx)], hidden)
                if reference_points.shape[-1] == 4:
                    reference_points = jax.nn.sigmoid(delta + inverse_sigmoid(reference_points))
                else:
                    delta = delta.at[..., :2].add(inverse_sigmoid(reference_points))
                    reference_points = jax.nn.sigmoid(delta)
                reference_points = jax.lax.stop_gradient(reference_points)
            intermediate.append(hidden)
            inter_refs.append(reference_points)
        return hidden, jnp.stack(intermediate, 1), jnp.stack(inter_refs, 1)


class DeformableDetrMLPPredictionHead(Module):
    def __init__(self, input_dim, hidden_dim, output_dim, num_layers, *, dtype, param_dtype):
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


class _InputProj(Module):
    """conv + GroupNorm(32) pair saved as Sequential names "0"/"1" (:1166)."""

    def __init__(self, in_ch, d_model, kernel_size, stride, padding, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self._children["0"] = Conv(in_ch, d_model, kernel_size, stride=stride,
                                   padding=padding, use_bias=True, ndim=2, **kw)
        self._children["1"] = GroupNorm(min(32, d_model), d_model, **kw)

    def __call__(self, params, x):
        return self._children["1"](params["1"], self._children["0"](params["0"], x))


class DeformableDetrModel(Module):
    def __init__(self, config: DeformableDetrConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        backbone = Module(**kw)
        backbone._children["conv_encoder"] = DeformableDetrConvEncoder(config, **kw)
        self.backbone = backbone
        channels = backbone._children["conv_encoder"].intermediate_channel_sizes
        projs = []
        if config.num_feature_levels > 1:
            for ch in channels:
                projs.append(_InputProj(ch, config.d_model, 1, 1, 0, **kw))
            in_ch = channels[-1]
            for _ in range(config.num_feature_levels - len(channels)):
                projs.append(_InputProj(in_ch, config.d_model, 3, 2, 1, **kw))
                in_ch = config.d_model
        else:
            projs.append(_InputProj(channels[-1], config.d_model, 1, 1, 0, **kw))
        self.input_proj = projs
        if not config.two_stage:
            self.query_position_embeddings = Embedding(
                config.num_queries, config.d_model * 2,
                embedding_init=normal_init(1.0), **kw)
        self.encoder = DeformableDetrEncoder(config, **kw)
        self.decoder = DeformableDetrDecoder(config, **kw)
        if config.two_stage:
            self.enc_output = Linear(config.d_model, config.d_model, **kw)
            self.enc_output_norm = LayerNorm(config.d_model, **kw)
            self.pos_trans = Linear(config.d_model * 2, config.d_model * 2, **kw)
            self.pos_trans_norm = LayerNorm(config.d_model * 2, **kw)
        else:
            self.reference_points = Linear(config.d_model, 2, **kw)

    def init(self, rng):
        params = super().init(rng)
        params["level_embed"] = jax.random.normal(
            rng, (self.config.num_feature_levels, self.config.d_model),
            self.param_dtype)
        return params

    def proposal_pos_embed(self, proposals):
        """reference get_proposal_pos_embed (:1237-1255): [B, Q, 4] -> [B, Q, 2d]."""
        num_pos_feats = self.config.d_model // 2
        dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
        dim_t = 10000.0 ** (2 * jnp.floor(dim_t / 2) / num_pos_feats)
        pos = jax.nn.sigmoid(proposals.astype(jnp.float32)) * (2 * math.pi)
        pos = pos[..., None] / dim_t
        pos = jnp.stack([jnp.sin(pos[..., 0::2]), jnp.cos(pos[..., 1::2])],
                        axis=-1).reshape(*pos.shape[:-2], -1)
        return pos.reshape(*pos.shape[:2], -1)

    def gen_encoder_output_proposals(self, params, enc_output, valid_mask, spatial_shapes):
        """reference :1257-1316 (valid_mask = True where REAL)."""
        b = enc_output.shape[0]
        proposals = []
        cur = 0
        for level, (h, w) in enumerate(spatial_shapes):
            m = valid_mask[:, cur:cur + h * w].reshape(b, h, w)
            valid_h = jnp.sum(m[:, :, 0], 1)
            valid_w = jnp.sum(m[:, 0, :], 1)
            gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                                  jnp.arange(w, dtype=jnp.float32), indexing="ij")
            grid = jnp.stack([gx, gy], -1)
            scale = jnp.stack([valid_w, valid_h], -1).reshape(b, 1, 1, 2)
            grid = (grid[None] + 0.5) / scale
            wh = jnp.ones_like(grid) * 0.05 * (2.0 ** level)
            proposals.append(jnp.concatenate([grid, wh], -1).reshape(b, -1, 4))
            cur += h * w
        output_proposals = jnp.concatenate(proposals, 1)
        valid = jnp.all((output_proposals > 0.01) & (output_proposals < 0.99),
                        -1, keepdims=True)
        output_proposals = jnp.log(output_proposals / (1 - output_proposals))
        bad = (~valid_mask[..., None]) | (~valid)
        output_proposals = jnp.where(bad, jnp.inf, output_proposals)
        object_query = jnp.where(bad, 0.0, enc_output)
        object_query = self.enc_output_norm(
            params["enc_output_norm"], self.enc_output(params["enc_output"], object_query))
        return object_query, output_proposals

    def __call__(self, params, pixel_values, pixel_mask=None,
                 head_class_params=None, head_bbox_params=None,
                 class_embed=None, bbox_embed=None):
        features = self.backbone._children["conv_encoder"](
            params["backbone"]["conv_encoder"], pixel_values)
        b = features[0].shape[0]
        img_h, img_w = pixel_values.shape[-2:]
        if pixel_mask is None:
            pixel_mask = jnp.ones((b, img_h, img_w), jnp.float32)
        pixel_mask = pixel_mask.astype(jnp.float32)

        sources, masks, pos_list = [], [], []
        for level, feat in enumerate(features):
            h, w = feat.shape[-2:]
            sources.append(self.input_proj[level](params["input_proj"][str(level)], feat))
            m = jax.image.resize(pixel_mask, (b, h, w), method="nearest")
            masks.append(m)
            pos_list.append(sine_position_embedding(m, self.config.d_model // 2))
        if self.config.num_feature_levels > len(sources):
            base = len(sources)
            for level in range(base, self.config.num_feature_levels):
                src = features[-1] if level == base else sources[-1]
                source = self.input_proj[level](params["input_proj"][str(level)], src)
                h, w = source.shape[-2:]
                m = jax.image.resize(pixel_mask, (b, h, w), method="nearest")
                sources.append(source)
                masks.append(m)
                pos_list.append(sine_position_embedding(m, self.config.d_model // 2))

        spatial_shapes = [(s.shape[-2], s.shape[-1]) for s in sources]
        source_flat, mask_flat, pos_flat = [], [], []
        level_embed = params["level_embed"].astype(sources[0].dtype)
        for level, (src, m, pos) in enumerate(zip(sources, masks, pos_list)):
            h, w = spatial_shapes[level]
            source_flat.append(src.reshape(b, self.config.d_model, h * w).transpose(0, 2, 1))
            mask_flat.append(m.reshape(b, h * w))
            pos_flat.append(pos.reshape(b, h * w, self.config.d_model).astype(src.dtype)
                            + level_embed[level][None, None])
        source_flat = jnp.concatenate(source_flat, 1)
        mask_flat = jnp.concatenate(mask_flat, 1)
        pos_flat = jnp.concatenate(pos_flat, 1)
        valid_ratios = jnp.stack(
            [jnp.stack([jnp.sum(m[:, 0, :], 1) / m.shape[2],
                        jnp.sum(m[:, :, 0], 1) / m.shape[1]], -1) for m in masks], 1)

        enc = self.encoder(params["encoder"], source_flat, pos_flat, spatial_shapes,
                           valid_ratios, value_valid=mask_flat)

        enc_outputs_class = enc_outputs_coord_logits = None
        if self.config.two_stage:
            object_query, output_proposals = self.gen_encoder_output_proposals(
                params, enc, mask_flat > 0.5, spatial_shapes)
            enc_outputs_class = class_embed(head_class_params[str(len(self.decoder.layers))],
                                            object_query)
            delta = bbox_embed(head_bbox_params[str(len(self.decoder.layers))], object_query)
            enc_outputs_coord_logits = delta + output_proposals
            topk = self.config.two_stage_num_proposals
            topk_idx = jax.lax.top_k(enc_outputs_class[..., 0], topk)[1]
            topk_coords_logits = jnp.take_along_axis(
                enc_outputs_coord_logits, topk_idx[..., None], axis=1)
            topk_coords_logits = jax.lax.stop_gradient(topk_coords_logits)
            reference_points = jax.nn.sigmoid(topk_coords_logits)
            init_reference = reference_points
            pos_trans_out = self.pos_trans_norm(
                params["pos_trans_norm"],
                self.pos_trans(params["pos_trans"],
                               self.proposal_pos_embed(topk_coords_logits).astype(enc.dtype)))
            query_embed, target = jnp.split(pos_trans_out, 2, axis=2)
        else:
            qpe = params["query_position_embeddings"]["weight"].astype(enc.dtype)
            query_embed, target = jnp.split(qpe, 2, axis=1)
            query_embed = jnp.broadcast_to(query_embed[None], (b, *query_embed.shape))
            target = jnp.broadcast_to(target[None], (b, *target.shape))
            reference_points = jax.nn.sigmoid(
                self.reference_points(params["reference_points"], query_embed))
            init_reference = reference_points

        dec_bbox_embed = bbox_embed if self.config.with_box_refine else None
        last, intermediate, inter_refs = self.decoder(
            params["decoder"], target, query_embed, enc, reference_points,
            spatial_shapes, valid_ratios, value_valid=mask_flat,
            bbox_embed=dec_bbox_embed, bbox_embed_params=head_bbox_params)
        return DeformableDetrModelOutput(
            init_reference_points=init_reference, last_hidden_state=last,
            intermediate_hidden_states=intermediate,
            intermediate_reference_points=inter_refs,
            encoder_last_hidden_state=enc,
            enc_outputs_class=enc_outputs_class,
            enc_outputs_coord_logits=enc_outputs_coord_logits)


class DeformableDetrPreTrainedModel(PreTrainedModel):
    config_class = DeformableDetrConfig
    base_model_prefix = "model"
    main_input_name = "pixel_values"
    _keys_to_ignore_on_load_unexpected = (
        r"num_batches_tracked",
        # box-refine/two-stage checkpoints alias the top-level heads inside the
        # decoder (reference :1586-1591); we route head params in at call time
        r"model\.decoder\.(bbox|class)_embed\.",
    )
    # hub checkpoints use the pre-v5 key layout (reference
    # conversion_mapping.py "deformable_detr": fc1/fc2 on the layer, out_proj)
    _weight_rules = (
        WeightRule(pattern=r"self_attn\.out_proj", rename="self_attn.o_proj",
                   save_pattern=r"self_attn\.o_proj", save_rename="self_attn.out_proj"),
        WeightRule(pattern=r"layers\.(\d+)\.fc1", rename=r"layers.\1.mlp.fc1",
                   save_pattern=r"layers\.(\d+)\.mlp\.fc1", save_rename=r"layers.\1.fc1"),
        WeightRule(pattern=r"layers\.(\d+)\.fc2", rename=r"layers.\1.mlp.fc2",
                   save_pattern=r"layers\.(\d+)\.mlp\.fc2", save_rename=r"layers.\1.fc2"),
    )


class DeformableDetrModelStandalone(DeformableDetrPreTrainedModel):
    """Bare model; like the reference, two-stage/box-refine head hooks only
    exist through ``DeformableDetrForObjectDetection`` (:1571-1576)."""

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.model = DeformableDetrModel(config, dtype=self.dtype,
                                         param_dtype=self.param_dtype)

    def __call__(self, params, pixel_values=None, pixel_mask=None, **kwargs):
        return self.model(params["model"], pixel_values, pixel_mask)


class DeformableDetrForObjectDetection(DeformableDetrPreTrainedModel):
    """reference :1541-1713. Per-layer class/bbox heads; sigmoid (focal) class
    logits with ``num_labels`` outputs (no no-object column)."""

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.model = DeformableDetrModel(config, **kw)
        num_pred = config.decoder_layers + 1 if config.two_stage else config.decoder_layers
        self.class_embed = [Linear(config.d_model, config.num_labels, **kw)
                            for _ in range(num_pred)]
        self.bbox_embed = [DeformableDetrMLPPredictionHead(
            config.d_model, config.d_model, 4, 3, **kw) for _ in range(num_pred)]
        self.num_pred = num_pred

    @property
    def _clones_tied(self):
        # reference :1545-1576: heads 1..N share head 0's storage only in the
        # plain (no box-refine, no two-stage) configuration; with refinement
        # each decoder layer gets its own independent head
        return not (getattr(self.config, "with_box_refine", False)
                    or getattr(self.config, "two_stage", False))

    @property
    def tied_weights_keys(self):
        # clones of head 0 are deduped at save time (reference :1545)
        if not self._clones_tied:
            return ()
        tied = []
        for i in range(1, self.num_pred):
            tied += [f"class_embed.{i}.weight", f"class_embed.{i}.bias"]
            for j in range(3):
                tied += [f"bbox_embed.{i}.layers.{j}.weight",
                         f"bbox_embed.{i}.layers.{j}.bias"]
        return tuple(tied)

    def tie_weights(self, params):
        """Checkpoints store only head 0; re-materialize the tied clones
        (reference _tied_weights_keys :1545-1548)."""
        if not self._clones_tied:
            return params
        def _has_leaves(t):
            return any(not isinstance(v, dict) or _has_leaves(v)
                       for v in t.values()) if isinstance(t, dict) else True

        for name in ("class_embed", "bbox_embed"):
            tree = params.get(name)
            if not isinstance(tree, dict) or not _has_leaves(tree.get("0", {})):
                continue
            # single-stage heads are clones of head 0 even at random init
            # (the slot may pre-exist as an empty dict skeleton from
            # loading._ensure_module_slots, so alias unconditionally)
            for i in range(1, self.num_pred):
                tree[str(i)] = jax.tree.map(lambda x: x, tree["0"])
        return params

    def __call__(self, params, pixel_values=None, pixel_mask=None, labels=None,
                 **kwargs) -> DeformableDetrObjectDetectionOutput:
        out = self.model(params["model"], pixel_values, pixel_mask,
                         head_class_params=params["class_embed"],
                         head_bbox_params=params["bbox_embed"],
                         class_embed=self.class_embed[0], bbox_embed=self.bbox_embed[0])
        hidden = out.intermediate_hidden_states  # [B, L, Q, D]
        outputs_classes, outputs_coords = [], []
        for level in range(hidden.shape[1]):
            if level == 0:
                reference = out.init_reference_points
            else:
                reference = out.intermediate_reference_points[:, level - 1]
            reference = inverse_sigmoid(reference)
            logits_l = self.class_embed[level](params["class_embed"][str(level)],
                                               hidden[:, level])
            delta = self.bbox_embed[level](params["bbox_embed"][str(level)],
                                           hidden[:, level])
            if reference.shape[-1] == 4:
                coord_logits = delta + reference
            else:
                coord_logits = delta.at[..., :2].add(reference)
            outputs_classes.append(logits_l)
            outputs_coords.append(jax.nn.sigmoid(coord_logits))
        logits = outputs_classes[-1]
        pred_boxes = outputs_coords[-1]
        loss = loss_dict = auxiliary_outputs = None
        if labels is not None:
            from ...loss.object_detection import deformable_detr_loss

            loss, loss_dict, auxiliary_outputs = deformable_detr_loss(
                jnp.stack(outputs_classes), jnp.stack(outputs_coords), labels,
                self.config)
        return DeformableDetrObjectDetectionOutput(
            loss=loss, loss_dict=loss_dict, logits=logits, pred_boxes=pred_boxes,
            auxiliary_outputs=auxiliary_outputs,
            last_hidden_state=out.last_hidden_state,
            init_reference_points=out.init_reference_points,
            intermediate_hidden_states=out.intermediate_hidden_states,
            intermediate_reference_points=out.intermediate_reference_points,
            encoder_last_hidden_state=out.encoder_last_hidden_state,
            enc_outputs_class=out.enc_outputs_class,
            enc_outputs_coord_logits=out.enc_outputs_coord_logits)
