"""Mask2Former (reference models/mask2former/modeling_mask2former.py):
universal segmentation — a Swin backbone feeds a multi-scale deformable
-attention pixel decoder (3 levels + FPN tail), and a masked-attention query
decoder attends only inside each query's previously predicted mask region,
cycling through the feature levels. Per-layer class + mask predictions with
point-sampled Hungarian loss."""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core.module import Conv, Embedding, GroupNorm, LayerNorm, Linear, Module, ModuleList, normal_init
from ...modeling_outputs import ModelOutput
from ...modeling_utils import PreTrainedModel
from ...ops.deformable import multi_scale_deformable_attention
from ..luke.modeling_luke import _Container
from ..maskformer.modeling_maskformer import sine_position_embedding
from ..swin.modeling_swin import SWIN_WEIGHT_RULES, SwinEmbeddings, SwinEncoder
from ..upernet.modeling_upernet import _bilinear
from .configuration_mask2former import Mask2FormerConfig


@dataclass
class Mask2FormerModelOutput(ModelOutput):
    encoder_last_hidden_state: Optional[jnp.ndarray] = None
    pixel_decoder_last_hidden_state: Optional[jnp.ndarray] = None
    transformer_decoder_last_hidden_state: Optional[jnp.ndarray] = None
    transformer_decoder_intermediate_states: Optional[tuple] = None
    masks_queries_logits: Optional[tuple] = None


@dataclass
class Mask2FormerForUniversalSegmentationOutput(ModelOutput):
    loss: Optional[jnp.ndarray] = None
    class_queries_logits: Optional[jnp.ndarray] = None
    masks_queries_logits: Optional[jnp.ndarray] = None
    auxiliary_logits: Optional[list] = None


class _SwinBackbone(Module):
    """Standard SwinBackbone: pre-downsample stage outputs normalized by
    ``hidden_states_norms.<stage>`` (reference SwinBackbone)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        g = config.image_size // config.patch_size
        self.channels = [int(config.embed_dim * 2 ** i)
                         for i in range(len(config.depths))]
        self.embeddings = SwinEmbeddings(config, **kw)
        self.encoder = SwinEncoder(config, (g, g), **kw)
        self.hidden_states_norms = _Container({
            f"stage{i + 1}": LayerNorm(c, 1e-5, **kw)
            for i, c in enumerate(self.channels)}, **kw)

    def __call__(self, params, pixel_values):
        hidden, dims = self.embeddings(params["embeddings"], pixel_values)
        h, w = dims
        feature_maps = []
        for i, stage in enumerate(self.encoder.layers):
            hidden, before = stage(params["encoder"]["layers"][str(i)], hidden)
            name = f"stage{i + 1}"
            norm = self.hidden_states_norms._children[name]
            normed = norm(params["hidden_states_norms"][name], before)
            b, _, c = normed.shape
            feature_maps.append(normed.transpose(0, 2, 1).reshape(b, c, h, w))
            h, w = max(1, h // 2), max(1, w // 2)
        return feature_maps


class Mask2FormerDeformableAttention(Module):
    def __init__(self, embed_dim, num_heads, n_levels, n_points, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.02))
        self.d_model = embed_dim
        self.n_levels = n_levels
        self.n_heads = num_heads
        self.n_points = n_points
        self.sampling_offsets = Linear(embed_dim,
                                       num_heads * n_levels * n_points * 2, True, **kw)
        self.attention_weights = Linear(embed_dim,
                                        num_heads * n_levels * n_points, True, **kw)
        self.value_proj = Linear(embed_dim, embed_dim, True, **kw)
        self.output_proj = Linear(embed_dim, embed_dim, True, **kw)

    def __call__(self, params, hidden, reference_points, spatial_shapes,
                 position_embeddings=None):
        if position_embeddings is not None:
            query = hidden + position_embeddings
        else:
            query = hidden
        b, s, _ = hidden.shape
        value = self.value_proj(params["value_proj"], hidden)
        value = value.reshape(b, s, self.n_heads, self.d_model // self.n_heads)
        offsets = self.sampling_offsets(params["sampling_offsets"], query)
        offsets = offsets.reshape(b, s, self.n_heads, self.n_levels, self.n_points, 2)
        weights = self.attention_weights(params["attention_weights"], query)
        weights = weights.reshape(b, s, self.n_heads, self.n_levels * self.n_points)
        weights = jax.nn.softmax(weights, -1).reshape(
            b, s, self.n_heads, self.n_levels, self.n_points)
        normalizer = jnp.asarray([[wd, ht] for ht, wd in spatial_shapes],
                                 jnp.float32)
        locations = (reference_points[:, :, None, :, None, :]
                     + offsets / normalizer[None, None, None, :, None, :])
        out = multi_scale_deformable_attention(value, spatial_shapes,
                                               locations, weights)
        return self.output_proj(params["output_proj"], out)


class Mask2FormerPixelDecoderEncoderLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        lkw = dict(**kw, kernel_init=normal_init(0.02))
        d = config.feature_size
        self.self_attn = Mask2FormerDeformableAttention(
            d, config.num_attention_heads, 3, 4, **kw)
        self.self_attn_layer_norm = LayerNorm(d, 1e-5, **kw)
        self.fc1 = Linear(d, config.encoder_feedforward_dim, True, **lkw)
        self.fc2 = Linear(config.encoder_feedforward_dim, d, True, **lkw)
        self.final_layer_norm = LayerNorm(d, 1e-5, **kw)

    def __call__(self, params, hidden, reference_points, spatial_shapes, pos):
        h = self.self_attn(params["self_attn"], hidden, reference_points,
                           spatial_shapes, pos)
        hidden = self.self_attn_layer_norm(params["self_attn_layer_norm"],
                                           hidden + h)
        h = self.fc2(params["fc2"],
                     jax.nn.relu(self.fc1(params["fc1"], hidden)))
        return self.final_layer_norm(params["final_layer_norm"], hidden + h)


def _reference_points(spatial_shapes):
    points = []
    for h, w in spatial_shapes:
        ry = (np.arange(h, dtype=np.float32) + 0.5) / h
        rx = (np.arange(w, dtype=np.float32) + 0.5) / w
        gy, gx = np.meshgrid(ry, rx, indexing="ij")
        points.append(np.stack([gx.reshape(-1), gy.reshape(-1)], -1))
    pts = np.concatenate(points, 0)  # [S, 2]
    n_levels = len(spatial_shapes)
    return jnp.asarray(np.broadcast_to(pts[None, :, None, :],
                                       (1, pts.shape[0], n_levels, 2)))


class Mask2FormerPixelDecoder(Module):
    def __init__(self, config, feature_channels, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.feature_size
        self.config = config
        self.num_feature_levels = 3
        transformer_in = feature_channels[-3:]
        self.input_projections = [
            _Container({"0": Conv(cin, d, 1, ndim=2, **kw),
                        "1": GroupNorm(32, d, 1e-5, **kw)}, **kw)
            for cin in transformer_in[::-1]]
        self.encoder = _Container({"layers": ModuleList(
            [Mask2FormerPixelDecoderEncoderLayer(config, **kw)
             for _ in range(config.encoder_layers)])}, **kw)
        self.mask_projection = Conv(d, config.mask_feature_size, 1, ndim=2, **kw)
        stride = min(config.feature_strides[-3:])
        self.num_fpn_levels = int(np.log2(stride) - np.log2(config.common_stride))
        laterals, outputs = [], []
        for cin in feature_channels[:self.num_fpn_levels]:
            laterals.append(_Container({
                "0": Conv(cin, d, 1, use_bias=False, ndim=2, **kw),
                "1": GroupNorm(32, d, 1e-5, **kw)}, **kw))
            outputs.append(_Container({
                "0": Conv(d, d, 3, padding=1, use_bias=False, ndim=2, **kw),
                "1": GroupNorm(32, d, 1e-5, **kw)}, **kw))
        for i, (lat, out) in enumerate(zip(laterals, outputs)):
            setattr(self, f"adapter_{i + 1}", lat)
            setattr(self, f"layer_{i + 1}", out)
        self._laterals = laterals[::-1]
        self._outputs = outputs[::-1]
        self._children.pop("_laterals", None)
        self._children.pop("_outputs", None)

    def init(self, rng):
        params = super().init(rng)
        params["level_embed"] = jnp.zeros(
            (self.num_feature_levels, self.config.feature_size), self.param_dtype)
        return params

    def __call__(self, params, features):
        d = self.config.feature_size
        embeds, poses = [], []
        for level, x in enumerate(features[::-1][:self.num_feature_levels]):
            proj = self.input_projections[level]._children
            p = params["input_projections"][str(level)]
            h = proj["1"](p["1"], proj["0"](p["0"], x))
            embeds.append(h)
            hh, ww = x.shape[2], x.shape[3]
            poses.append(sine_position_embedding(hh, ww, d // 2))
        spatial_shapes = [(e.shape[2], e.shape[3]) for e in embeds]
        flat = jnp.concatenate(
            [e.reshape(e.shape[0], d, -1).transpose(0, 2, 1) for e in embeds], 1)
        pos_flat = jnp.concatenate(poses, 0)[None].astype(flat.dtype)
        level_pos = []
        for i, (h, w) in enumerate(spatial_shapes):
            level_pos.append(jnp.broadcast_to(
                params["level_embed"][i][None], (h * w, d)))
        lvl = jnp.concatenate(level_pos, 0)[None].astype(flat.dtype)
        hidden = flat + lvl
        pos_embed = pos_flat
        ref = _reference_points(spatial_shapes)
        layers = self.encoder._children["layers"]
        for i in range(len(layers)):
            hidden = layers[i](params["encoder"]["layers"][str(i)], hidden,
                               ref, spatial_shapes, pos_embed)
        # split back to maps
        outs = []
        start = 0
        b = hidden.shape[0]
        for h, w in spatial_shapes:
            chunk = hidden[:, start:start + h * w]
            outs.append(chunk.transpose(0, 2, 1).reshape(b, d, h, w))
            start += h * w
        # FPN tail on the remaining high-res features
        for idx, feature in enumerate(features[:self.num_fpn_levels][::-1]):
            lat = self._laterals[idx]._children
            outc = self._outputs[idx]._children
            pl = params[f"adapter_{self.num_fpn_levels - idx}"]
            po = params[f"layer_{self.num_fpn_levels - idx}"]
            cur = lat["1"](pl["1"], lat["0"](pl["0"], feature))
            up = _bilinear(outs[-1], cur.shape[-2:])
            h = cur + up
            h = jax.nn.relu(outc["1"](po["1"], outc["0"](po["0"], h)))
            outs.append(h)
        mask_features = self.mask_projection(params["mask_projection"], outs[-1])
        return mask_features, outs[:self.num_feature_levels]


class Mask2FormerAttention(Module):
    """Self-attention with pos added to q and k (not v)."""

    def __init__(self, embed_dim, num_heads, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.02))
        self.num_heads = num_heads
        self.head_dim = embed_dim // num_heads
        self.q_proj = Linear(embed_dim, embed_dim, True, **kw)
        self.k_proj = Linear(embed_dim, embed_dim, True, **kw)
        self.v_proj = Linear(embed_dim, embed_dim, True, **kw)
        self.out_proj = Linear(embed_dim, embed_dim, True, **kw)

    def __call__(self, params, hidden, pos):
        b, s, e = hidden.shape
        qk_in = hidden + pos if pos is not None else hidden
        q = self.q_proj(params["q_proj"], qk_in).reshape(b, s, self.num_heads, self.head_dim)
        k = self.k_proj(params["k_proj"], qk_in).reshape(b, s, self.num_heads, self.head_dim)
        v = self.v_proj(params["v_proj"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores * (self.head_dim ** -0.5)
        probs = jax.nn.softmax(scores, -1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, e)
        return self.out_proj(params["out_proj"], out)


class _TorchMHA(Module):
    """nn.MultiheadAttention weights (fused in_proj + out_proj)."""

    def __init__(self, embed_dim, num_heads, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.embed_dim = embed_dim
        self.num_heads = num_heads
        self.head_dim = embed_dim // num_heads
        self.out_proj = Linear(embed_dim, embed_dim, True,
                               dtype=dtype, param_dtype=param_dtype,
                               kernel_init=normal_init(0.02))

    def init(self, rng):
        params = super().init(rng)
        e = self.embed_dim
        params["in_proj_weight"] = normal_init(0.02)(rng, (3 * e, e), self.param_dtype)
        params["in_proj_bias"] = jnp.zeros((3 * e,), self.param_dtype)
        return params

    def __call__(self, params, query, key, value, attn_mask=None):
        e = self.embed_dim
        w = params["in_proj_weight"].astype(query.dtype)
        bias = params["in_proj_bias"].astype(query.dtype)
        q = query @ w[:e].T + bias[:e]
        k = key @ w[e:2 * e].T + bias[e:2 * e]
        v = value @ w[2 * e:].T + bias[2 * e:]
        b, sq, _ = q.shape
        sk = k.shape[1]
        q = q.reshape(b, sq, self.num_heads, self.head_dim)
        k = k.reshape(b, sk, self.num_heads, self.head_dim)
        v = v.reshape(b, sk, self.num_heads, self.head_dim)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores * (self.head_dim ** -0.5)
        if attn_mask is not None:  # bool [B, H, Q, S]; True = masked
            scores = jnp.where(attn_mask, jnp.finfo(jnp.float32).min, scores)
        probs = jax.nn.softmax(scores, -1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, sq, e)
        return self.out_proj(params["out_proj"], out)


class Mask2FormerMaskedAttentionDecoderLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        lkw = dict(**kw, kernel_init=normal_init(0.02))
        d = config.hidden_dim
        self.pre_norm = config.pre_norm
        self.self_attn = Mask2FormerAttention(d, config.num_attention_heads, **kw)
        self.self_attn_layer_norm = LayerNorm(d, 1e-5, **kw)
        self.cross_attn = _TorchMHA(d, config.num_attention_heads, **kw)
        self.cross_attn_layer_norm = LayerNorm(d, 1e-5, **kw)
        self.fc1 = Linear(d, config.dim_feedforward, True, **lkw)
        self.fc2 = Linear(config.dim_feedforward, d, True, **lkw)
        self.final_layer_norm = LayerNorm(d, 1e-5, **kw)

    def __call__(self, params, hidden, level_features, level_pos, query_pos,
                 attn_mask):
        if self.pre_norm:
            residual = hidden
            h = self.cross_attn_layer_norm(params["cross_attn_layer_norm"], hidden)
            h = self.cross_attn(params["cross_attn"], h + query_pos,
                                level_features + level_pos, level_features,
                                attn_mask)
            hidden = residual + h
            residual = hidden
            h = self.self_attn_layer_norm(params["self_attn_layer_norm"], hidden)
            h = self.self_attn(params["self_attn"], h, query_pos)
            hidden = residual + h
            residual = hidden
            h = self.final_layer_norm(params["final_layer_norm"], hidden)
            h = self.fc2(params["fc2"], jax.nn.relu(self.fc1(params["fc1"], h)))
            return residual + h
        h = self.cross_attn(params["cross_attn"], hidden + query_pos,
                            level_features + level_pos, level_features,
                            attn_mask)
        hidden = self.cross_attn_layer_norm(params["cross_attn_layer_norm"],
                                            hidden + h)
        h = self.self_attn(params["self_attn"], hidden, query_pos)
        hidden = self.self_attn_layer_norm(params["self_attn_layer_norm"],
                                           hidden + h)
        h = self.fc2(params["fc2"], jax.nn.relu(self.fc1(params["fc1"], hidden)))
        return self.final_layer_norm(params["final_layer_norm"], hidden + h)


class Mask2FormerMaskPredictor(Module):
    def __init__(self, hidden_size, num_heads, mask_feature_size, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        lkw = dict(**kw, kernel_init=normal_init(0.02))
        self.num_heads = num_heads
        self.mask_embedder = _Container({
            "0": _Container({"0": Linear(hidden_size, hidden_size, True, **lkw)}, **kw),
            "1": _Container({"0": Linear(hidden_size, hidden_size, True, **lkw)}, **kw),
            "2": _Container({"0": Linear(hidden_size, mask_feature_size, True, **lkw)}, **kw),
        }, **kw)

    def __call__(self, params, outputs, pixel_embeddings, target_size):
        mods = self.mask_embedder._children
        p = params["mask_embedder"]
        h = jax.nn.relu(mods["0"]._children["0"](p["0"]["0"], outputs))
        h = jax.nn.relu(mods["1"]._children["0"](p["1"]["0"], h))
        emb = mods["2"]._children["0"](p["2"]["0"], h)
        outputs_mask = jnp.einsum("bqc,bchw->bqhw", emb, pixel_embeddings)
        attn = _bilinear(outputs_mask, target_size)
        attn = jax.nn.sigmoid(attn).reshape(attn.shape[0], attn.shape[1], -1)
        attn_mask = (attn < 0.5)[:, None]  # [B, 1, Q, S]
        attn_mask = jnp.broadcast_to(
            attn_mask, (attn.shape[0], self.num_heads) + attn.shape[1:])
        return outputs_mask, attn_mask


class Mask2FormerTransformerModule(Module):
    def __init__(self, in_features, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.hidden_dim
        self.config = config
        self.num_feature_levels = 3
        self.queries_embedder = Embedding(config.num_queries, d, **kw)
        self.queries_features = Embedding(config.num_queries, d, **kw)
        self.should_project = (in_features != d or config.enforce_input_projection)
        if self.should_project:
            self.input_projections = [
                Conv(in_features, d, 1, ndim=2, **kw)
                for _ in range(self.num_feature_levels)]
        self.level_embed = Embedding(self.num_feature_levels, d, **kw)
        # reference uses decoder_layers - 1 blocks: the queries' initial
        # state counts as the first prediction layer
        self._layers = [Mask2FormerMaskedAttentionDecoderLayer(config, **kw)
                        for _ in range(config.decoder_layers - 1)]
        self._children.pop("_layers", None)
        self.decoder = _Container({
            "layers": ModuleList(self._layers),
            "layernorm": LayerNorm(d, 1e-5, **kw),
            "mask_predictor": Mask2FormerMaskPredictor(
                d, config.num_attention_heads, config.mask_feature_size, **kw),
        }, **kw)

    def __call__(self, params, multi_scale_features, mask_features):
        d = self.config.hidden_dim
        feats, poses, sizes = [], [], []
        for i in range(self.num_feature_levels):
            x = multi_scale_features[i]
            b, c, h, w = x.shape
            sizes.append((h, w))
            pos = sine_position_embedding(h, w, d // 2)[None]
            poses.append(jnp.broadcast_to(pos, (b, h * w, d)).astype(x.dtype))
            if self.should_project:
                x = self.input_projections[i](
                    params["input_projections"][str(i)], x)
            flat = x.reshape(b, d, h * w).transpose(0, 2, 1)
            flat = flat + params["level_embed"]["weight"][i][None, None]
            feats.append(flat)
        b = feats[0].shape[0]
        query_pos = jnp.broadcast_to(params["queries_embedder"]["weight"][None],
                                     (b,) + params["queries_embedder"]["weight"].shape)
        hidden = jnp.broadcast_to(params["queries_features"]["weight"][None],
                                  (b,) + params["queries_features"]["weight"].shape)
        ln = self.decoder._children["layernorm"]
        predictor = self.decoder._children["mask_predictor"]
        pdec = params["decoder"]
        intermediate = []
        mask_preds = []
        inter_h = ln(pdec["layernorm"], hidden)
        intermediate.append(inter_h)
        predicted_mask, attn_mask = predictor(pdec["mask_predictor"], inter_h,
                                              mask_features, sizes[0])
        mask_preds.append(predicted_mask)
        for idx, layer in enumerate(self._layers):
            li = idx % self.num_feature_levels
            # un-mask queries whose mask is empty
            full = attn_mask.all(-1, keepdims=True)
            attn_mask = jnp.where(full, False, attn_mask)
            hidden = layer(pdec["layers"][str(idx)], hidden, feats[li],
                           poses[li], query_pos, attn_mask)
            inter_h = ln(pdec["layernorm"], hidden)
            predicted_mask, attn_mask = predictor(
                pdec["mask_predictor"], inter_h, mask_features,
                sizes[(idx + 1) % self.num_feature_levels])
            mask_preds.append(predicted_mask)
            intermediate.append(inter_h)
        return tuple(intermediate), tuple(mask_preds)


class Mask2FormerPreTrainedModel(PreTrainedModel):
    config_class = Mask2FormerConfig
    base_model_prefix = "model"
    main_input_name = "pixel_values"
    _weight_rules = SWIN_WEIGHT_RULES
    _keys_to_ignore_on_load_unexpected = (r"relative_position_index",
                                          r"empty_weight$")


class _Mask2FormerCore(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        backbone = _SwinBackbone(config.backbone_config, **kw)
        decoder = Mask2FormerPixelDecoder(config, backbone.channels, **kw)
        self.pixel_level_module = _Container({"encoder": backbone,
                                              "decoder": decoder}, **kw)
        self.transformer_module = Mask2FormerTransformerModule(
            config.feature_size, config, **kw)

    def __call__(self, params, pixel_values):
        plm = self.pixel_level_module._children
        p = params["pixel_level_module"]
        features = plm["encoder"](p["encoder"], pixel_values)
        mask_features, multi_scale = plm["decoder"](p["decoder"], features)
        intermediate, mask_preds = self.transformer_module(
            params["transformer_module"], multi_scale, mask_features)
        return Mask2FormerModelOutput(
            encoder_last_hidden_state=features[-1],
            pixel_decoder_last_hidden_state=mask_features,
            transformer_decoder_last_hidden_state=intermediate[-1],
            transformer_decoder_intermediate_states=intermediate,
            masks_queries_logits=mask_preds)


class Mask2FormerModel(Mask2FormerPreTrainedModel):
    def __init__(self, config: Mask2FormerConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        core = _Mask2FormerCore(config, dtype=self.dtype, param_dtype=self.param_dtype)
        for name, child in core._children.items():
            setattr(self, name, child)
        self._core = core
        self._children.pop("_core", None)

    def __call__(self, params, pixel_values=None, **kwargs) -> Mask2FormerModelOutput:
        return self._core(params, jnp.asarray(pixel_values, self.dtype))


class Mask2FormerForUniversalSegmentation(Mask2FormerPreTrainedModel):
    def __init__(self, config: Mask2FormerConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.model = _Mask2FormerCore(config, **kw)
        self.class_predictor = Linear(config.hidden_dim, config.num_labels + 1,
                                      True, kernel_init=normal_init(0.02), **kw)

    def _loss(self, params, mask_preds, class_preds, mask_labels, class_labels):
        """Point-sampled matched loss (reference Mask2FormerLoss). The
        Hungarian matcher cost uses uniform points (as the reference does);
        the matched mask/dice loss samples points by prediction uncertainty
        (sample_points_using_uncertainty: oversample_ratio pool, keep the
        importance_sample_ratio most-uncertain). JAX keys, so statistically
        equivalent to the torch sampler, not bit-identical."""
        from scipy.optimize import linear_sum_assignment

        cfg = self.config
        key = jax.random.key(0)
        num_masks = max(sum(len(c) for c in class_labels), 1)
        empty_weight = np.ones(cfg.num_labels + 1, np.float32)
        empty_weight[-1] = cfg.no_object_weight
        total = 0.0
        npoints = min(cfg.train_num_points,
                      mask_labels[0].shape[-1] * mask_labels[0].shape[-2])
        for masks_q, class_q in zip(mask_preds, class_preds):
            key, sub = jax.random.split(key)
            pts = jax.random.uniform(sub, (npoints, 2))
            indices = []
            for b in range(len(class_labels)):
                lb = jnp.asarray(mask_labels[b], jnp.float32)
                pm = _point_sample(masks_q[b], pts)
                tm = _point_sample(lb, pts)
                probs = jax.nn.softmax(class_q[b].astype(jnp.float32), -1)
                cost_class = -probs[:, jnp.asarray(class_labels[b])]
                ce_pos = jnp.maximum(pm, 0) - pm + jnp.log1p(jnp.exp(-jnp.abs(pm)))
                ce_neg = jnp.maximum(pm, 0) + jnp.log1p(jnp.exp(-jnp.abs(pm)))
                cost_mask = (ce_pos @ tm.T + ce_neg @ (1 - tm).T) / npoints
                prob = jax.nn.sigmoid(pm)
                numer = 2 * (prob @ tm.T)
                denom = prob.sum(-1)[:, None] + tm.sum(-1)[None, :]
                cost_dice = 1 - (numer + 1) / (denom + 1)
                cost = (cfg.mask_weight * np.asarray(cost_mask)
                        + cfg.class_weight * np.asarray(cost_class)
                        + cfg.dice_weight * np.asarray(cost_dice))
                indices.append(linear_sum_assignment(cost))
            bsz, q, _ = class_q.shape
            target = np.full((bsz, q), cfg.num_labels, np.int64)
            for b, (src, tgt_i) in enumerate(indices):
                target[b, src] = np.asarray(class_labels[b])[tgt_i]
            logp = jax.nn.log_softmax(class_q.astype(jnp.float32), -1)
            w = jnp.asarray(empty_weight)[jnp.asarray(target)]
            nll = -jnp.take_along_axis(logp, jnp.asarray(target)[..., None],
                                       axis=-1)[..., 0]
            loss_ce = (nll * w).sum() / w.sum()
            preds, tgts = [], []
            for b, (src, tgt_i) in enumerate(indices):
                lb = jnp.asarray(mask_labels[b], jnp.float32)
                pmasks = masks_q[b][jnp.asarray(src)]
                key, sub = jax.random.split(key)
                ppts = _sample_points_using_uncertainty(
                    sub, jax.lax.stop_gradient(pmasks), npoints,
                    cfg.oversample_ratio, cfg.importance_sample_ratio)
                per_mask = jax.vmap(lambda m, p: _point_sample(m[None], p)[0])
                preds.append(per_mask(pmasks, ppts))
                tgts.append(per_mask(lb[jnp.asarray(tgt_i)], ppts))
            pm = jnp.concatenate(preds)
            tm = jnp.concatenate(tgts)
            ce = jnp.maximum(pm, 0) - pm * tm + jnp.log1p(jnp.exp(-jnp.abs(pm)))
            loss_mask = ce.mean(1).sum() / num_masks
            prob = jax.nn.sigmoid(pm)
            numer = 2 * (prob * tm).sum(-1)
            denom = prob.sum(-1) + tm.sum(-1)
            loss_dice = (1 - (numer + 1) / (denom + 1)).sum() / num_masks
            total = total + cfg.class_weight * loss_ce \
                + cfg.mask_weight * loss_mask + cfg.dice_weight * loss_dice
        return total

    def __call__(self, params, pixel_values=None, mask_labels=None,
                 class_labels=None, pixel_mask=None,
                 output_auxiliary_logits=None,
                 **kwargs) -> Mask2FormerForUniversalSegmentationOutput:
        outputs = self.model(params["model"],
                             jnp.asarray(pixel_values, self.dtype))
        classes = [self.class_predictor(params["class_predictor"], h)
                   for h in outputs.transformer_decoder_intermediate_states]
        class_queries_logits = classes[-1]
        masks_queries_logits = outputs.masks_queries_logits[-1]
        aux = [{"masks_queries_logits": m, "class_queries_logits": c}
               for m, c in zip(outputs.masks_queries_logits[:-1], classes[:-1])]
        loss = None
        if mask_labels is not None and class_labels is not None:
            mask_list = list(outputs.masks_queries_logits)
            class_list = classes
            if not self.config.use_auxiliary_loss:
                mask_list, class_list = mask_list[-1:], class_list[-1:]
            loss = self._loss(params, mask_list, class_list, mask_labels,
                              class_labels)
        return Mask2FormerForUniversalSegmentationOutput(
            loss=loss, class_queries_logits=class_queries_logits,
            masks_queries_logits=masks_queries_logits,
            auxiliary_logits=aux or None)


def _sample_points_using_uncertainty(key, logits, num_points, oversample_ratio,
                                     importance_sample_ratio):
    """Per-mask point coords [N, num_points, 2] (reference
    modeling_mask2former.py sample_points_using_uncertainty): draw an
    oversampled uniform pool, keep the importance_sample_ratio fraction with
    highest uncertainty (-|logit| at the point), fill the rest uniformly."""
    n = logits.shape[0]
    num_sampled = int(num_points * oversample_ratio)
    k1, k2 = jax.random.split(key)
    pts = jax.random.uniform(k1, (n, num_sampled, 2))
    vals = jax.vmap(lambda m, p: _point_sample(m[None], p)[0])(logits, pts)
    num_uncertain = min(int(importance_sample_ratio * num_points), num_sampled)
    num_random = num_points - num_uncertain
    idx = jax.lax.top_k(-jnp.abs(vals), num_uncertain)[1]
    chosen = jnp.take_along_axis(pts, idx[..., None], axis=1)
    if num_random > 0:
        chosen = jnp.concatenate(
            [chosen, jax.random.uniform(k2, (n, num_random, 2))], axis=1)
    return chosen


def _point_sample(masks, points):
    """Bilinear point sampling of [N, H, W] at [P, 2] normalized (x, y)."""
    n, h, w = masks.shape
    x = points[:, 0] * w - 0.5
    y = points[:, 1] * h - 0.5
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    wx = jnp.clip(x - x0, 0, 1)
    wy = jnp.clip(y - y0, 0, 1)
    g00 = masks[:, y0, x0]
    g01 = masks[:, y0, x1]
    g10 = masks[:, y1, x0]
    g11 = masks[:, y1, x1]
    top = g00 * (1 - wx) + g01 * wx
    bot = g10 * (1 - wx) + g11 * wx
    return top * (1 - wy) + bot * wy
