"""Conditional DETR (reference
models/conditional_detr/modeling_conditional_detr.py): DETR with decoupled
content/spatial queries — per-layer content & position projections, a
reference point per query whose sine embedding (scaled by a learned
query-scale MLP after layer 0) is CONCATENATED onto q/k head-wise in cross
attention, and bbox deltas applied around the reference points."""

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
from ..detr.modeling_detr import (
    DetrConvEncoder,
    DetrEncoder,
    DetrMLPPredictionHead,
    sine_position_embedding,
)
from .configuration_conditional_detr import ConditionalDetrConfig


@dataclass
class ConditionalDetrModelOutput(ModelOutput):
    last_hidden_state: Optional[jnp.ndarray] = None
    reference_points: Optional[jnp.ndarray] = None
    encoder_last_hidden_state: Optional[jnp.ndarray] = None


@dataclass
class ConditionalDetrObjectDetectionOutput(ModelOutput):
    loss: Optional[jnp.ndarray] = None
    logits: Optional[jnp.ndarray] = None
    pred_boxes: Optional[jnp.ndarray] = None


def inverse_sigmoid(x, eps=1e-5):
    x = jnp.clip(x, 0, 1)
    return jnp.log(jnp.clip(x, eps) / jnp.clip(1 - x, eps))


def gen_sine_position_embeddings(pos, d_model):
    """[B, Q, 2] centers -> [B, Q, d_model] (reference
    gen_sine_position_embeddings — y block then x block)."""
    scale = 2 * math.pi
    dim = d_model // 2
    dim_t = np.arange(dim, dtype=np.float32)
    dim_t = 10000.0 ** (2 * np.floor(dim_t / 2) / dim)
    x = pos[:, :, 0] * scale
    y = pos[:, :, 1] * scale
    px = x[:, :, None] / dim_t
    py = y[:, :, None] / dim_t
    px = jnp.stack([jnp.sin(px[:, :, 0::2]), jnp.cos(px[:, :, 1::2])],
                   axis=3).reshape(*px.shape[:2], -1)
    py = jnp.stack([jnp.sin(py[:, :, 0::2]), jnp.cos(py[:, :, 1::2])],
                   axis=3).reshape(*py.shape[:2], -1)
    return jnp.concatenate([py, px], axis=2)


def _split_heads(x, n):
    b, s, d = x.shape
    return x.reshape(b, s, n, d // n)


class ConditionalDetrDecoderLayer(Module):
    def __init__(self, config, *, dtype, param_dtype, is_first=False):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.init_std))
        nkw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.d_model
        self.nhead = config.decoder_attention_heads
        self.is_first = is_first
        self.sa_qcontent_proj = Linear(d, d, True, **kw)
        self.sa_qpos_proj = Linear(d, d, True, **kw)
        self.sa_kcontent_proj = Linear(d, d, True, **kw)
        self.sa_kpos_proj = Linear(d, d, True, **kw)
        self.sa_v_proj = Linear(d, d, True, **kw)
        self.self_attn = _OutProjOnly(d, **nkw)
        self.self_attn_layer_norm = LayerNorm(d, **nkw)
        self.ca_qcontent_proj = Linear(d, d, True, **kw)
        if is_first:
            self.ca_qpos_proj = Linear(d, d, True, **kw)
        self.ca_kcontent_proj = Linear(d, d, True, **kw)
        self.ca_kpos_proj = Linear(d, d, True, **kw)
        self.ca_v_proj = Linear(d, d, True, **kw)
        self.ca_qpos_sine_proj = Linear(d, d, True, **kw)
        self.encoder_attn = _OutProjOnly(d, **nkw)
        self.encoder_attn_layer_norm = LayerNorm(d, **nkw)
        self.fc1 = Linear(d, config.decoder_ffn_dim, True, **kw)
        self.fc2 = Linear(config.decoder_ffn_dim, d, True, **kw)
        self.final_layer_norm = LayerNorm(d, **nkw)
        self.act = get_activation(config.activation_function)

    def __call__(self, params, hidden, query_pos, query_sine_embed,
                 enc_hidden, enc_pos, enc_valid):
        n = self.nhead
        residual = hidden
        q = (self.sa_qcontent_proj(params["sa_qcontent_proj"], hidden)
             + self.sa_qpos_proj(params["sa_qpos_proj"], query_pos))
        k = (self.sa_kcontent_proj(params["sa_kcontent_proj"], hidden)
             + self.sa_kpos_proj(params["sa_kpos_proj"], query_pos))
        v = self.sa_v_proj(params["sa_v_proj"], hidden)
        head_dim = q.shape[-1] // n
        attn = eager_attention(_split_heads(q, n), _split_heads(k, n),
                               _split_heads(v, n), scale=head_dim ** -0.5,
                               is_causal=False)
        h = self.self_attn(params["self_attn"], attn.reshape(hidden.shape))
        hidden = self.self_attn_layer_norm(params["self_attn_layer_norm"],
                                           residual + h)

        q_content = self.ca_qcontent_proj(params["ca_qcontent_proj"], hidden)
        k_content = self.ca_kcontent_proj(params["ca_kcontent_proj"], enc_hidden)
        v = self.ca_v_proj(params["ca_v_proj"], enc_hidden)
        k_pos = self.ca_kpos_proj(params["ca_kpos_proj"], enc_pos)
        if self.is_first:
            q_content = q_content + self.ca_qpos_proj(params["ca_qpos_proj"],
                                                      query_pos)
            k_base = k_content + k_pos
        else:
            k_base = k_content
        b, nq, d = q_content.shape
        src_len = k_content.shape[1]
        sine = self.ca_qpos_sine_proj(params["ca_qpos_sine_proj"], query_sine_embed)
        q = jnp.concatenate([_split_heads(q_content, n), _split_heads(sine, n)],
                            axis=3).reshape(b, nq, 2 * d)
        k = jnp.concatenate([_split_heads(k_base, n), _split_heads(k_pos, n)],
                            axis=3).reshape(b, src_len, 2 * d)
        head_dim = (2 * d) // n
        attn = eager_attention(_split_heads(q, n), _split_heads(k, n),
                               _split_heads(v, n), scale=head_dim ** -0.5,
                               is_causal=False, kv_valid=enc_valid)
        residual = hidden
        h = self.encoder_attn(params["encoder_attn"], attn.reshape(b, nq, d))
        hidden = self.encoder_attn_layer_norm(params["encoder_attn_layer_norm"],
                                              residual + h)
        residual = hidden
        h = self.fc2(params["fc2"], self.act(self.fc1(params["fc1"], hidden)))
        return self.final_layer_norm(params["final_layer_norm"], residual + h)


class _OutProjOnly(Module):
    """The reference ConditionalDetrAttention keeps only out_proj inside the
    attention module (q/k/v projections live on the layer)."""

    def __init__(self, d, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.out_proj = Linear(d, d, True, dtype=dtype, param_dtype=param_dtype,
                               kernel_init=normal_init(0.02))

    def __call__(self, params, x):
        return self.out_proj(params["out_proj"], x)


class ConditionalDetrDecoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.d_model
        self.config = config
        self.layers = [ConditionalDetrDecoderLayer(config, is_first=(i == 0), **kw)
                       for i in range(config.decoder_layers)]
        self.layernorm = LayerNorm(d, **kw)
        self.query_scale = DetrMLPPredictionHead(d, d, d, 2, **kw)
        self.ref_point_head = DetrMLPPredictionHead(d, d, 2, 2, **kw)

    def __call__(self, params, hidden, query_pos, enc_hidden, enc_pos, enc_valid):
        ref_before = self.ref_point_head(params["ref_point_head"], query_pos)
        reference_points = jax.nn.sigmoid(ref_before)
        obj_center = reference_points[..., :2]
        sine_base = gen_sine_position_embeddings(
            obj_center, self.config.d_model).astype(hidden.dtype)
        for i, layer in enumerate(self.layers):
            if i == 0:
                sine = sine_base
            else:
                sine = sine_base * self.query_scale(params["query_scale"], hidden)
            hidden = layer(params["layers"][str(i)], hidden, query_pos, sine,
                           enc_hidden, enc_pos, enc_valid)
        return self.layernorm(params["layernorm"], hidden), reference_points


class ConditionalDetrModel(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        from ...core.module import Conv

        backbone = Module(**kw)
        backbone._children["conv_encoder"] = DetrConvEncoder(config, **kw)
        self.backbone = backbone
        self.input_projection = Conv(
            backbone._children["conv_encoder"].out_channels, config.d_model, 1,
            stride=1, padding=0, use_bias=True, ndim=2, **kw)
        self.query_position_embeddings = Embedding(
            config.num_queries, config.d_model,
            embedding_init=normal_init(config.init_std), **kw)
        self.encoder = DetrEncoder(config, **kw)
        self.decoder = ConditionalDetrDecoder(config, **kw)

    def __call__(self, params, pixel_values, pixel_mask=None):
        feat = self.backbone._children["conv_encoder"](
            params["backbone"]["conv_encoder"], pixel_values)
        b, _, h, w = feat.shape
        proj = self.input_projection(params["input_projection"], feat)
        flat = proj.reshape(b, self.config.d_model, h * w).transpose(0, 2, 1)
        mask = jnp.ones((b, h, w), bool) if pixel_mask is None else (
            jax.image.resize(pixel_mask.astype(jnp.float32), (b, h, w),
                             method="nearest") > 0.5)
        pos = sine_position_embedding(h, w, self.config.d_model // 2,
                                      mask=mask.astype(jnp.float32))
        pos = pos.reshape(b, h * w, self.config.d_model).astype(flat.dtype)
        kv_valid = mask.reshape(b, h * w).astype(jnp.int32)
        enc = self.encoder(params["encoder"], flat, pos, kv_valid)
        queries = jnp.broadcast_to(
            params["query_position_embeddings"]["weight"].astype(flat.dtype)[None],
            (b, self.config.num_queries, self.config.d_model))
        tgt = jnp.zeros_like(queries)
        dec, refs = self.decoder(params["decoder"], tgt, queries, enc, pos, kv_valid)
        return ConditionalDetrModelOutput(last_hidden_state=dec,
                                          reference_points=refs,
                                          encoder_last_hidden_state=enc)


class ConditionalDetrPreTrainedModel(PreTrainedModel):
    config_class = ConditionalDetrConfig
    base_model_prefix = "model"
    main_input_name = "pixel_values"
    _keys_to_ignore_on_load_unexpected = (r"num_batches_tracked",)


class ConditionalDetrModelStandalone(ConditionalDetrPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.model = ConditionalDetrModel(config, dtype=self.dtype,
                                          param_dtype=self.param_dtype)

    def __call__(self, params, pixel_values=None, pixel_mask=None, **kwargs):
        return self.model(params["model"], pixel_values, pixel_mask)


class ConditionalDetrForObjectDetection(ConditionalDetrPreTrainedModel):
    """reference ConditionalDetrForObjectDetection: sigmoid class logits
    (num_labels, focal loss convention) and bbox deltas around the decoder's
    reference points."""

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.model = ConditionalDetrModel(config, **kw)
        self.class_labels_classifier = Linear(
            config.d_model, config.num_labels, True,
            kernel_init=normal_init(config.init_std), **kw)
        self.bbox_predictor = DetrMLPPredictionHead(
            config.d_model, config.d_model, 4, 3, **kw)

    def __call__(self, params, pixel_values=None, pixel_mask=None, labels=None,
                 **kwargs) -> ConditionalDetrObjectDetectionOutput:
        out = self.model(params["model"], pixel_values, pixel_mask)
        logits = self.class_labels_classifier(params["class_labels_classifier"],
                                              out.last_hidden_state)
        ref_before = inverse_sigmoid(out.reference_points)
        tmp = self.bbox_predictor(params["bbox_predictor"], out.last_hidden_state)
        tmp = tmp.at[..., :2].add(ref_before)
        pred_boxes = jax.nn.sigmoid(tmp)
        loss = None
        if labels is not None:
            # sigmoid-focal class loss + L1 + GIoU (reference loss_function
            # with focal_alpha; same recipe as deformable DETR's per-level)
            from ...loss.object_detection import _deformable_level_loss

            parts = _deformable_level_loss(logits, pred_boxes, labels, self.config)
            loss = (self.config.cls_loss_coefficient * parts["loss_ce"]
                    + self.config.bbox_loss_coefficient * parts["loss_bbox"]
                    + self.config.giou_loss_coefficient * parts["loss_giou"])
        return ConditionalDetrObjectDetectionOutput(
            loss=loss, logits=logits, pred_boxes=pred_boxes)
