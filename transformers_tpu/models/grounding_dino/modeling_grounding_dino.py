"""Grounding-DINO (reference models/grounding_dino/modeling_grounding_dino.py):
open-vocabulary detection — a BERT caption encoder and a multi-scale
deformable image encoder exchange information through bi-directional
cross-attention fusion + text-enhancer layers; a two-stage pipeline selects
the top-num_queries proposals by contrastive (query . text) score and the
decoder refines boxes with self / text-cross / deformable-cross attention.
Reuses the Deformable-DETR deformable attention, proposal generation and
sine embeddings; ResNet backbone via the deformable conv encoder."""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core.loading import WeightRule
from ...core.module import Embedding, LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import ModelOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ..bert.modeling_bert import BertModel
from ..deformable_detr.modeling_deformable_detr import (
    DeformableDetrConvEncoder,
    DeformableDetrMLPPredictionHead,
    DeformableDetrMultiscaleDeformableAttention,
    _InputProj,
    encoder_reference_points,
    inverse_sigmoid,
    sine_position_embedding,
)
from .configuration_grounding_dino import GroundingDinoConfig

# BERT [CLS]/[SEP]/./? delimit phrases (reference SPECIAL_TOKENS :1808)
SPECIAL_TOKENS = (101, 102, 1012, 1029)


@dataclass
class GroundingDinoObjectDetectionOutput(ModelOutput):
    loss: Any = None
    logits: Any = None
    pred_boxes: Any = None
    last_hidden_state: Any = None
    init_reference_points: Any = None
    intermediate_hidden_states: Any = None
    intermediate_reference_points: Any = None
    encoder_logits: Any = None
    encoder_pred_boxes: Any = None


def sine_pos_from_coords(pos, num_pos_feats=128, temperature=10000):
    """reference encode_sinusoidal_position_embedding:39 — per-coordinate
    interleaved sin/cos, x/y swapped for the DETR [y, x, ...] order."""
    scale = 2 * math.pi
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * jnp.floor(dim_t / 2) / num_pos_feats)
    embs = []
    for i in range(pos.shape[-1]):
        e = pos[..., i, None].astype(jnp.float32) * scale / dim_t
        e = jnp.stack([jnp.sin(e[..., 0::2]), jnp.cos(e[..., 1::2])],
                      axis=-1).reshape(*e.shape[:-1], -1)
        embs.append(e)
    if len(embs) >= 2:
        embs[0], embs[1] = embs[1], embs[0]
    return jnp.concatenate(embs, axis=-1)


def generate_masks_with_special_tokens(input_ids: np.ndarray):
    """reference generate_masks_with_special_tokens_and_transfer_map:1811:
    per-phrase block self-attention over the caption + phrase-local position
    ids. Returns (bool mask [B, S, S], position_ids [B, S])."""
    ids = np.asarray(input_ids)
    b, s = ids.shape
    special = np.isin(ids, SPECIAL_TOKENS)
    idx = np.broadcast_to(np.arange(s), (b, s))
    # index of the special token strictly BEFORE each position (blocks span
    # prev+1 .. next inclusive — the closing special token belongs to its
    # phrase and gets a phrase-local position too)
    prev_incl = np.maximum.accumulate(np.where(special, idx, -1), axis=1)
    prev = np.concatenate([np.full((b, 1), -1), prev_incl[:, :-1]], axis=1)
    nxt = np.where(special, idx, s)
    nxt = np.flip(np.minimum.accumulate(np.flip(nxt, 1), axis=1), 1)
    valid = (nxt != 0) & (nxt != s - 1) & (nxt != s)
    mask = (nxt[:, :, None] == nxt[:, None, :]) & valid[:, None, :]
    mask |= np.eye(s, dtype=bool)[None]
    pos = idx - prev - 1
    pos = np.where(valid, pos, 0)
    return mask, np.maximum(pos, 0).astype(np.int64)


class GroundingDinoMultiheadAttention(Module):
    """BERT-style q/k/v/out_proj attention with an additive mask
    (reference :1115)."""

    def __init__(self, config, num_heads, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        d = config.d_model
        self.num_heads = num_heads
        self.head_dim = d // num_heads
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.init_std))
        self.query = Linear(d, d, **kw)
        self.key = Linear(d, d, **kw)
        self.value = Linear(d, d, **kw)
        self.out_proj = Linear(d, d, **kw)

    def __call__(self, params, queries, keys, values, bias=None):
        b, sq, d = queries.shape
        sk = keys.shape[1]
        h, hd = self.num_heads, self.head_dim
        q = self.query(params["query"], queries).reshape(b, sq, h, hd)
        k = self.key(params["key"], keys).reshape(b, sk, h, hd)
        v = self.value(params["value"], values).reshape(b, sk, h, hd)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) / math.sqrt(hd)
        if bias is not None:
            scores = scores + bias.astype(jnp.float32)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
        return self.out_proj(params["out_proj"], out.reshape(b, sq, d))


class GroundingDinoTextEnhancerLayer(Module):
    """reference :630 — post-norm text self-attention block at half heads/
    half FFN width."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.d_model
        self.self_attn = GroundingDinoMultiheadAttention(
            config, config.encoder_attention_heads // 2, **kw)
        lkw = dict(dtype=dtype, param_dtype=param_dtype,
                   kernel_init=normal_init(config.init_std))
        self.fc1 = Linear(d, config.encoder_ffn_dim // 2, **lkw)
        self.fc2 = Linear(config.encoder_ffn_dim // 2, d, **lkw)
        self.layer_norm_before = LayerNorm(d, config.layer_norm_eps, **kw)
        self.layer_norm_after = LayerNorm(d, config.layer_norm_eps, **kw)
        self.act = get_activation(config.activation_function)

    def __call__(self, params, hidden, attn_bias, pos):
        qk = hidden if pos is None else hidden + pos
        attn = self.self_attn(params["self_attn"], qk, qk, hidden, attn_bias)
        hidden = self.layer_norm_before(params["layer_norm_before"], hidden + attn)
        residual = hidden
        h = self.fc2(params["fc2"], self.act(self.fc1(params["fc1"], hidden)))
        return self.layer_norm_after(params["layer_norm_after"], residual + h)


class GroundingDinoBiMultiHeadAttention(Module):
    """reference :712 — image<->text bidirectional cross-attention with the
    shared (clamped, max-stabilized) score matrix."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        d = config.d_model
        self.embed_dim = config.encoder_ffn_dim // 2
        self.num_heads = config.encoder_attention_heads // 2
        self.head_dim = self.embed_dim // self.num_heads
        self.scale = self.head_dim ** -0.5
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.init_std))
        self.vision_proj = Linear(d, self.embed_dim, **kw)
        self.text_proj = Linear(d, self.embed_dim, **kw)
        self.values_vision_proj = Linear(d, self.embed_dim, **kw)
        self.values_text_proj = Linear(d, self.embed_dim, **kw)
        self.out_vision_proj = Linear(self.embed_dim, d, **kw)
        self.out_text_proj = Linear(self.embed_dim, d, **kw)

    def __call__(self, params, vision, text, vision_pad=None, text_pad=None):
        b, nv, _ = vision.shape
        nt = text.shape[1]
        h, hd = self.num_heads, self.head_dim
        vq = (self.vision_proj(params["vision_proj"], vision) * self.scale
              ).reshape(b, nv, h, hd)
        tk = self.text_proj(params["text_proj"], text).reshape(b, nt, h, hd)
        vv = self.values_vision_proj(params["values_vision_proj"], vision
                                     ).reshape(b, nv, h, hd)
        tv = self.values_text_proj(params["values_text_proj"], text
                                   ).reshape(b, nt, h, hd)
        scores = jnp.einsum("bvhd,bthd->bhvt", vq, tk,
                            preferred_element_type=jnp.float32)
        scores = jnp.clip(scores - scores.max(), -50000, 50000)
        scores_t = jnp.swapaxes(scores, 2, 3)
        scores_t = jnp.clip(scores_t - scores_t.max(-1, keepdims=True),
                            -50000, 50000)
        if vision_pad is not None:
            scores_t = jnp.where(vision_pad[:, None, None, :].astype(bool),
                                 -jnp.inf, scores_t)
        text_probs = jax.nn.softmax(scores_t, axis=-1)
        if text_pad is not None:
            scores = jnp.where(text_pad[:, None, None, :].astype(bool),
                               -jnp.inf, scores)
        vision_probs = jax.nn.softmax(scores, axis=-1)
        v_out = jnp.einsum("bhvt,bthd->bvhd", vision_probs.astype(tv.dtype), tv)
        t_out = jnp.einsum("bhtv,bvhd->bthd", text_probs.astype(vv.dtype), vv)
        v_out = self.out_vision_proj(params["out_vision_proj"],
                                     v_out.reshape(b, nv, self.embed_dim))
        t_out = self.out_text_proj(params["out_text_proj"],
                                   t_out.reshape(b, nt, self.embed_dim))
        return v_out, t_out


class GroundingDinoFusionLayer(Module):
    """reference :888 — pre-norm fusion with learned layer-scale params."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.layer_norm_vision = LayerNorm(config.d_model, config.layer_norm_eps, **kw)
        self.layer_norm_text = LayerNorm(config.d_model, config.layer_norm_eps, **kw)
        self.attn = GroundingDinoBiMultiHeadAttention(config, **kw)
        self.d_model = config.d_model

    def init(self, rng):
        params = super().init(rng)
        params["vision_param"] = jnp.full((self.d_model,), 1e-4, self.param_dtype)
        params["text_param"] = jnp.full((self.d_model,), 1e-4, self.param_dtype)
        return params

    def __call__(self, params, vision, text, vision_pad=None, text_pad=None):
        vn = self.layer_norm_vision(params["layer_norm_vision"], vision)
        tn = self.layer_norm_text(params["layer_norm_text"], text)
        dv, dt = self.attn(params["attn"], vn, tn, vision_pad, text_pad)
        vision = vn + params["vision_param"].astype(dv.dtype) * dv
        text = tn + params["text_param"].astype(dt.dtype) * dt
        return vision, text


class GroundingDinoDeformableLayer(Module):
    """reference :951 — the standard deformable encoder block."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.d_model
        self.self_attn = DeformableDetrMultiscaleDeformableAttention(
            config, config.encoder_attention_heads, config.encoder_n_points, **kw)
        self.self_attn_layer_norm = LayerNorm(d, config.layer_norm_eps, **kw)
        lkw = dict(dtype=dtype, param_dtype=param_dtype,
                   kernel_init=normal_init(config.init_std))
        self.fc1 = Linear(d, config.encoder_ffn_dim, **lkw)
        self.fc2 = Linear(config.encoder_ffn_dim, d, **lkw)
        self.final_layer_norm = LayerNorm(d, config.layer_norm_eps, **kw)
        self.act = get_activation(config.activation_function)

    def __call__(self, params, hidden, pos, reference_points, spatial_shapes,
                 value_valid=None):
        residual = hidden
        h = self.self_attn(params["self_attn"],
                           hidden if pos is None else hidden + pos,
                           hidden, reference_points, spatial_shapes,
                           value_valid=value_valid)
        hidden = self.self_attn_layer_norm(params["self_attn_layer_norm"],
                                           residual + h)
        residual = hidden
        h = self.fc2(params["fc2"], self.act(self.fc1(params["fc1"], hidden)))
        return self.final_layer_norm(params["final_layer_norm"], residual + h)


class GroundingDinoEncoderLayer(Module):
    """reference :1035 — fusion -> text enhancer -> deformable."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.d_model = config.d_model
        self.text_enhancer_layer = GroundingDinoTextEnhancerLayer(config, **kw)
        self.fusion_layer = GroundingDinoFusionLayer(config, **kw)
        self.deformable_layer = GroundingDinoDeformableLayer(config, **kw)

    def __call__(self, params, vision, pos, reference_points, spatial_shapes,
                 vision_valid, text, text_pad, text_self_bias, text_pos_ids):
        text_pos = sine_pos_from_coords(text_pos_ids[..., None].astype(jnp.float32),
                                        num_pos_feats=self.d_model)
        vision_pad = None if vision_valid is None else (1 - vision_valid)
        vision, text = self.fusion_layer(params["fusion_layer"], vision, text,
                                         vision_pad, text_pad)
        text = self.text_enhancer_layer(params["text_enhancer_layer"], text,
                                        text_self_bias, text_pos)
        vision = self.deformable_layer(params["deformable_layer"], vision, pos,
                                       reference_points, spatial_shapes,
                                       vision_valid)
        return vision, text


class GroundingDinoDecoderLayer(Module):
    """reference :1187 — self attn -> text cross attn -> deformable cross."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.d_model
        heads = config.decoder_attention_heads
        self.self_attn = GroundingDinoMultiheadAttention(config, heads, **kw)
        self.self_attn_layer_norm = LayerNorm(d, config.layer_norm_eps, **kw)
        self.encoder_attn_text = GroundingDinoMultiheadAttention(config, heads, **kw)
        self.encoder_attn_text_layer_norm = LayerNorm(d, config.layer_norm_eps, **kw)
        self.encoder_attn = DeformableDetrMultiscaleDeformableAttention(
            config, heads, config.decoder_n_points, **kw)
        self.encoder_attn_layer_norm = LayerNorm(d, config.layer_norm_eps, **kw)
        lkw = dict(dtype=dtype, param_dtype=param_dtype,
                   kernel_init=normal_init(config.init_std))
        self.fc1 = Linear(d, config.decoder_ffn_dim, **lkw)
        self.fc2 = Linear(config.decoder_ffn_dim, d, **lkw)
        self.final_layer_norm = LayerNorm(d, config.layer_norm_eps, **kw)
        self.act = get_activation(config.activation_function)

    def __call__(self, params, hidden, query_pos, reference_points,
                 spatial_shapes, vision_hidden, vision_valid, text_hidden,
                 text_pad_bias):
        qk = hidden + query_pos
        h = self.self_attn(params["self_attn"], qk, qk, hidden)
        hidden = self.self_attn_layer_norm(params["self_attn_layer_norm"],
                                           hidden + h)
        h = self.encoder_attn_text(params["encoder_attn_text"],
                                   hidden + query_pos, text_hidden,
                                   text_hidden, text_pad_bias)
        hidden = self.encoder_attn_text_layer_norm(
            params["encoder_attn_text_layer_norm"], hidden + h)
        h = self.encoder_attn(params["encoder_attn"], hidden + query_pos,
                              vision_hidden, reference_points, spatial_shapes,
                              value_valid=vision_valid)
        hidden = self.encoder_attn_layer_norm(params["encoder_attn_layer_norm"],
                                              hidden + h)
        residual = hidden
        h = self.fc2(params["fc2"], self.act(self.fc1(params["fc1"], hidden)))
        return self.final_layer_norm(params["final_layer_norm"], residual + h)


def contrastive_logits(queries, text_hidden, text_token_mask, max_text_len,
                       scaled=False, bias=None):
    """reference GroundingDinoContrastiveEmbedding:1305 (plain dot product);
    with ``scaled``/``bias`` the MM-Grounding-DINO variant (1/sqrt(d) scaling
    + learned scalar bias, mm_grounding_dino/modular_mm_grounding_dino.py:168)."""
    out = queries @ jnp.swapaxes(text_hidden, -1, -2)
    if scaled:
        out = out / math.sqrt(queries.shape[-1])
    if bias is not None:
        out = out + bias
    out = jnp.where(text_token_mask[:, None, :].astype(bool), out, -jnp.inf)
    pad = jnp.full((*out.shape[:-1], max_text_len - out.shape[-1]), -jnp.inf,
                   out.dtype)
    return jnp.concatenate([out, pad], axis=-1)


class GroundingDinoPreTrainedModel(PreTrainedModel):
    config_class = GroundingDinoConfig
    base_model_prefix = "model"
    _keys_to_ignore_on_load_unexpected = (
        r".*position_ids$", r".*pooler\..*")


class GroundingDinoModel(Module):
    def __init__(self, config: GroundingDinoConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        backbone = Module(**kw)
        conv_model = Module(**kw)
        conv_model._children["conv_encoder"] = DeformableDetrConvEncoder(config, **kw)
        backbone._children["conv_encoder"] = conv_model._children["conv_encoder"]
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
        self.input_proj_vision = projs
        self.text_backbone = BertModel(config.text_config, add_pooling_layer=False, **kw)
        self.text_projection = Linear(config.text_config.hidden_size,
                                      config.d_model, **kw)
        if config.embedding_init_target or not config.two_stage:
            self.query_position_embeddings = Embedding(
                config.num_queries, config.d_model,
                embedding_init=normal_init(1.0), **kw)
        self.encoder_layers = [GroundingDinoEncoderLayer(config, **kw)
                               for _ in range(config.encoder_layers)]
        self.decoder_layers = [GroundingDinoDecoderLayer(config, **kw)
                               for _ in range(config.decoder_layers)]
        self.decoder_reference_points_head = DeformableDetrMLPPredictionHead(
            config.query_dim // 2 * config.d_model, config.d_model,
            config.d_model, 2, **kw)
        self.decoder_layer_norm = LayerNorm(config.d_model, config.layer_norm_eps, **kw)
        if config.two_stage:
            self.enc_output = Linear(config.d_model, config.d_model, **kw)
            self.enc_output_norm = LayerNorm(config.d_model, config.layer_norm_eps, **kw)
            self.encoder_output_bbox_embed = DeformableDetrMLPPredictionHead(
                config.d_model, config.d_model, 4, 3, **kw)

    def init(self, rng):
        params = super().init(rng)
        params["level_embed"] = jax.random.normal(
            rng, (self.config.num_feature_levels, self.config.d_model),
            self.param_dtype)
        return params

    def gen_encoder_output_proposals(self, params, enc_output, valid_mask,
                                     spatial_shapes):
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
        bad = (valid_mask[..., None] < 0.5) | (~valid)
        output_proposals = jnp.where(bad, jnp.inf, output_proposals)
        object_query = jnp.where(bad, 0.0, enc_output)
        object_query = self.enc_output_norm(
            params["enc_output_norm"],
            self.enc_output(params["enc_output"], object_query))
        return object_query, output_proposals

    def __call__(self, params, pixel_values, input_ids, token_type_ids=None,
                 attention_mask=None, pixel_mask=None):
        cfg = self.config
        ids_np = np.asarray(input_ids)
        self_mask_np, pos_ids_np = generate_masks_with_special_tokens(ids_np)
        if attention_mask is None:
            attention_mask = jnp.ones_like(jnp.asarray(input_ids))
        text_token_mask = jnp.asarray(attention_mask)
        text_self_bias = jnp.where(jnp.asarray(self_mask_np)[:, None], 0.0,
                                   jnp.finfo(jnp.float32).min)
        text_pos_ids = jnp.asarray(pos_ids_np)

        text_out = self.text_backbone(
            params["text_backbone"], jnp.asarray(input_ids),
            token_type_ids=None if token_type_ids is None else jnp.asarray(token_type_ids),
            position_ids=text_pos_ids, attention_bias=text_self_bias)
        text_features = self.text_projection(params["text_projection"],
                                             text_out.last_hidden_state)

        b = pixel_values.shape[0]
        img_h, img_w = pixel_values.shape[-2:]
        if pixel_mask is None:
            pixel_mask = jnp.ones((b, img_h, img_w), jnp.float32)
        pixel_mask = pixel_mask.astype(jnp.float32)
        features = self.backbone._children["conv_encoder"](
            params["backbone"]["conv_encoder"], pixel_values)
        sources, masks, pos_list = [], [], []
        for level, feat in enumerate(features):
            h, w = feat.shape[-2:]
            sources.append(self.input_proj_vision[level](
                params["input_proj_vision"][str(level)], feat))
            m = jax.image.resize(pixel_mask, (b, h, w), method="nearest")
            masks.append(m)
            pos_list.append(sine_position_embedding(
                m, cfg.d_model // 2, temperature=cfg.positional_embedding_temperature))
        if cfg.num_feature_levels > len(sources):
            base = len(sources)
            for level in range(base, cfg.num_feature_levels):
                src = features[-1] if level == base else sources[-1]
                source = self.input_proj_vision[level](
                    params["input_proj_vision"][str(level)], src)
                h, w = source.shape[-2:]
                m = jax.image.resize(pixel_mask, (b, h, w), method="nearest")
                sources.append(source)
                masks.append(m)
                pos_list.append(sine_position_embedding(
                    m, cfg.d_model // 2,
                    temperature=cfg.positional_embedding_temperature))

        spatial_shapes = [(s.shape[-2], s.shape[-1]) for s in sources]
        level_embed = params["level_embed"].astype(sources[0].dtype)
        src_flat, mask_flat, pos_flat = [], [], []
        for level, (source, m, pos) in enumerate(zip(sources, masks, pos_list)):
            c = source.shape[1]
            src_flat.append(source.reshape(b, c, -1).transpose(0, 2, 1))
            mask_flat.append(m.reshape(b, -1))
            pos_flat.append(pos.reshape(b, -1, pos.shape[-1])
                            + level_embed[level][None, None])
        source_flatten = jnp.concatenate(src_flat, 1)
        mask_flatten = jnp.concatenate(mask_flat, 1)
        pos_flatten = jnp.concatenate(pos_flat, 1)
        valid_ratios = jnp.stack([
            jnp.stack([jnp.sum(m[:, 0, :], 1) / m.shape[2],
                       jnp.sum(m[:, :, 0], 1) / m.shape[1]], -1)
            for m in masks], 1).astype(jnp.float32)  # (w, h) order

        # ---- encoder
        reference_points = encoder_reference_points(spatial_shapes, valid_ratios)
        text_pad_bias = jnp.where(text_token_mask[:, None, None, :].astype(bool),
                                  0.0, jnp.finfo(jnp.float32).min)
        vision, text = source_flatten, text_features
        for i, layer in enumerate(self.encoder_layers):
            vision, text = layer(params["encoder_layers"][str(i)], vision,
                                 pos_flatten, reference_points, spatial_shapes,
                                 mask_flatten, text,
                                 1 - text_token_mask, text_self_bias,
                                 text_pos_ids)

        # ---- two-stage proposal selection (reference :2185-2215)
        object_query, output_proposals = self.gen_encoder_output_proposals(
            params, vision, mask_flatten, spatial_shapes)
        enc_outputs_class = self._enc_contrastive(params, object_query, text,
                                                  text_token_mask)
        delta = self.encoder_output_bbox_embed(
            params["encoder_output_bbox_embed"], object_query)
        enc_outputs_coord_logits = delta + output_proposals
        topk = cfg.num_queries
        topk_logits = jnp.where(jnp.isfinite(enc_outputs_class),
                                enc_outputs_class, -jnp.inf).max(-1)
        _, topk_idx = jax.lax.top_k(topk_logits, topk)
        topk_coords = jnp.take_along_axis(enc_outputs_coord_logits,
                                          topk_idx[..., None], axis=1)
        reference = jax.nn.sigmoid(jax.lax.stop_gradient(topk_coords))
        init_reference = reference
        target = jnp.broadcast_to(
            params["query_position_embeddings"]["weight"][None].astype(vision.dtype),
            (b, cfg.num_queries, cfg.d_model))
        encoder_logits = self._enc_contrastive(params, target, text,
                                               text_token_mask)
        encoder_pred_boxes = reference

        # ---- decoder with iterative box refinement
        hidden = target
        intermediate, inter_refs = [], []
        for idx, layer in enumerate(self.decoder_layers):
            ref_input = reference[:, :, None] * jnp.concatenate(
                [valid_ratios, valid_ratios], -1)[:, None]
            query_pos = sine_pos_from_coords(ref_input[:, :, 0, :],
                                             num_pos_feats=cfg.d_model // 2)
            query_pos = self.decoder_reference_points_head(
                params["decoder_reference_points_head"], query_pos)
            hidden = layer(params["decoder_layers"][str(idx)], hidden,
                           query_pos, ref_input, spatial_shapes, vision,
                           mask_flatten, text, text_pad_bias)
            delta = self._bbox_embed(idx, hidden)
            reference = jax.nn.sigmoid(delta + inverse_sigmoid(reference))
            reference = jax.lax.stop_gradient(reference)
            intermediate.append(self.decoder_layer_norm(
                params["decoder_layer_norm"], hidden))
            inter_refs.append(reference)
        return {
            "last_hidden_state": intermediate[-1],
            "intermediate": jnp.stack(intermediate, 1),
            "intermediate_refs": jnp.stack(inter_refs, 1),
            "init_reference": init_reference,
            "text_hidden": text,
            "text_token_mask": text_token_mask,
            "enc_outputs_class": enc_outputs_class,
            "encoder_logits": encoder_logits,
            "encoder_pred_boxes": encoder_pred_boxes,
        }

    # bound by the detection head (tied per-layer bbox MLPs)
    def _bbox_embed(self, idx, hidden):
        raise RuntimeError("bbox_embed is bound by GroundingDinoForObjectDetection")

    def _enc_contrastive(self, params, queries, text, text_token_mask):
        """Encoder-stage class logits; MM-Grounding-DINO overrides with the
        scaled + biased contrastive head."""
        return contrastive_logits(queries, text, text_token_mask,
                                  self.config.max_text_len)


class GroundingDinoForObjectDetection(GroundingDinoPreTrainedModel):
    _prefill_input_names = ()
    _weight_rules = (
        # reference ties every decoder-layer bbox head to bbox_embed.0 when
        # decoder_bbox_embed_share (checkpoints store only the shared copy)
        WeightRule(pattern=r"^model\.decoder\.layers\.(\d+)\.",
                   rename=r"model.decoder_layers.\1."),
        WeightRule(pattern=r"^model\.encoder\.layers\.(\d+)\.",
                   rename=r"model.encoder_layers.\1."),
        WeightRule(pattern=r"^model\.decoder\.reference_points_head\.",
                   rename=r"model.decoder_reference_points_head."),
        WeightRule(pattern=r"^model\.decoder\.layer_norm\.",
                   rename=r"model.decoder_layer_norm."),
        WeightRule(pattern=r"^model\.backbone\.conv_encoder\.model\.",
                   rename=r"model.backbone.conv_encoder.model."),
        WeightRule(pattern=r"(.*)\.attn\.(query|key|value|out_proj)\.(.*)",
                   rename=r"\1.\2.\3"),
    )

    def __init__(self, config: GroundingDinoConfig, *, dtype=jnp.float32,
                 param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.model = GroundingDinoModel(config, **kw)
        n_bbox = 1 if config.decoder_bbox_embed_share else config.decoder_layers
        self.bbox_embed = [DeformableDetrMLPPredictionHead(
            config.d_model, config.d_model, 4, 3, **kw) for _ in range(n_bbox)]
        self._params_ref = None

        def bound_bbox(idx, hidden):
            share = self.config.decoder_bbox_embed_share
            i = 0 if share else idx
            return self.bbox_embed[i](self._params_ref["bbox_embed"][str(i)], hidden)

        self.model._bbox_embed = bound_bbox

    def _cls_contrastive(self, params, level, hidden, text, text_token_mask):
        """Per-decoder-level class logits (reference :2560); MM overrides
        with the scaled + per-level-bias contrastive head."""
        return contrastive_logits(hidden, text, text_token_mask,
                                  self.config.max_text_len)

    def __call__(self, params, pixel_values=None, input_ids=None,
                 token_type_ids=None, attention_mask=None, pixel_mask=None,
                 labels=None, **kwargs):
        self._params_ref = params
        out = self.model(params["model"], pixel_values, input_ids,
                         token_type_ids, attention_mask, pixel_mask)
        cfg = self.config
        n_levels = out["intermediate"].shape[1]
        logits = self._cls_contrastive(params, n_levels - 1,
                                       out["last_hidden_state"],
                                       out["text_hidden"],
                                       out["text_token_mask"])
        pred_boxes = out["intermediate_refs"][:, -1]
        loss = None
        if labels is not None:
            from ...loss.object_detection import deformable_detr_loss

            outputs_class = jnp.stack([
                self._cls_contrastive(params, i, out["intermediate"][:, i],
                                      out["text_hidden"],
                                      out["text_token_mask"])
                for i in range(n_levels)], 1)
            finite_class = jnp.where(jnp.isfinite(outputs_class),
                                     outputs_class, -1e4)
            loss, _, _ = deformable_detr_loss(
                finite_class, out["intermediate_refs"], labels, cfg)
        return GroundingDinoObjectDetectionOutput(
            loss=loss, logits=logits, pred_boxes=pred_boxes,
            last_hidden_state=out["last_hidden_state"],
            init_reference_points=out["init_reference"],
            intermediate_hidden_states=out["intermediate"],
            intermediate_reference_points=out["intermediate_refs"],
            encoder_logits=out["encoder_logits"],
            encoder_pred_boxes=out["encoder_pred_boxes"])
