"""DAB-DETR (reference models/dab_detr/modeling_dab_detr.py): queries ARE
4-d anchor boxes — each decoder layer attends with the anchor's sine
embedding (width/height-modulated), refines the anchors through a shared
bbox MLP, and the classification head reads the last refined state."""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core.loading import WeightRule
from ...core.module import Conv, Embedding, LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import ModelOutput
from ...modeling_utils import PreTrainedModel
from ...ops.attention import eager_attention
from ..detr.modeling_detr import DetrMLPPredictionHead
from ..resnet.modeling_resnet import ResNetModel
from .configuration_dab_detr import DabDetrConfig


@dataclass
class DabDetrModelOutput(ModelOutput):
    last_hidden_state: Optional[jnp.ndarray] = None
    intermediate_hidden_states: Optional[jnp.ndarray] = None
    reference_points: Optional[jnp.ndarray] = None


@dataclass
class DabDetrObjectDetectionOutput(ModelOutput):
    loss: Optional[jnp.ndarray] = None
    logits: Optional[jnp.ndarray] = None
    pred_boxes: Optional[jnp.ndarray] = None


def inverse_sigmoid(x, eps=1e-5):
    x = jnp.clip(x, 0, 1)
    return jnp.log(jnp.clip(x, eps) / jnp.clip(1 - x, eps))


def _prelu(x, weight):
    w = weight.astype(x.dtype)
    return jnp.where(x >= 0, x, w * x)


def _sine_pos_2d(mask, dim, temp_h, temp_w, scale):
    """[B, H, W] mask -> [B, H, W, 2*dim] (reference
    DabDetrSinePositionEmbedding, per-axis temperatures)."""
    m = mask.astype(jnp.float32)
    y = jnp.cumsum(m, axis=1)
    x = jnp.cumsum(m, axis=2)
    y = y / (y[:, -1:, :] + 1e-6) * scale
    x = x / (x[:, :, -1:] + 1e-6) * scale
    dt = np.arange(dim, dtype=np.float32)
    dtx = temp_w ** (2 * np.floor(dt / 2) / dim)
    dty = temp_h ** (2 * np.floor(dt / 2) / dim)
    px = x[..., None] / dtx
    py = y[..., None] / dty
    px = jnp.stack([jnp.sin(px[..., 0::2]), jnp.cos(px[..., 1::2])],
                   axis=4).reshape(*px.shape[:-1], -1)
    py = jnp.stack([jnp.sin(py[..., 0::2]), jnp.cos(py[..., 1::2])],
                   axis=4).reshape(*py.shape[:-1], -1)
    return jnp.concatenate([py, px], axis=-1)


def gen_sine_position_embeddings(pos, hidden_size):
    """[B, Q, 4] anchors -> [B, Q, 2*hidden_size] (y, x, w, h blocks)."""
    scale = 2 * math.pi
    dim = hidden_size // 2
    dim_t = 10000.0 ** (2 * np.floor(np.arange(dim, dtype=np.float32) / 2) / dim)

    def block(v):
        p = (v * scale)[:, :, None] / dim_t
        return jnp.stack([jnp.sin(p[:, :, 0::2]), jnp.cos(p[:, :, 1::2])],
                         axis=3).reshape(*p.shape[:2], -1)

    return jnp.concatenate([block(pos[:, :, 1]), block(pos[:, :, 0]),
                            block(pos[:, :, 2]), block(pos[:, :, 3])], axis=2)


def _split_heads(x, n):
    b, s, d = x.shape
    return x.reshape(b, s, n, d // n)


class _OutProj(Module):
    def __init__(self, d, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.output_proj = Linear(d, d, True, dtype=dtype, param_dtype=param_dtype,
                                  kernel_init=normal_init(0.02))

    def __call__(self, params, x):
        return self.output_proj(params["output_proj"], x)


class DabDetrEncoderLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.init_std))
        nkw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.hidden_size
        self.nhead = config.encoder_attention_heads
        from ..luke.modeling_luke import _Container

        self.self_attn = _Container({
            "q_proj": Linear(d, d, True, **kw),
            "k_proj": Linear(d, d, True, **kw),
            "v_proj": Linear(d, d, True, **kw),
            "out_proj": Linear(d, d, True, **kw)}, **nkw)
        self.self_attn_layer_norm = LayerNorm(d, **nkw)
        self.fc1 = Linear(d, config.encoder_ffn_dim, True, **kw)
        self.fc2 = Linear(config.encoder_ffn_dim, d, True, **kw)
        self.final_layer_norm = LayerNorm(d, **nkw)

    def init(self, rng):
        params = super().init(rng)
        params["activation_fn"] = {"weight": jnp.full((1,), 0.25, self.param_dtype)}
        return params

    def __call__(self, params, hidden, pos, kv_valid):
        sa = params["self_attn"]
        q_in = hidden + pos
        n = self.nhead
        q = self.self_attn._children["q_proj"](sa["q_proj"], q_in)
        k = self.self_attn._children["k_proj"](sa["k_proj"], q_in)
        v = self.self_attn._children["v_proj"](sa["v_proj"], hidden)
        head_dim = q.shape[-1] // n
        attn = eager_attention(_split_heads(q, n), _split_heads(k, n),
                               _split_heads(v, n), scale=head_dim ** -0.5,
                               is_causal=False, kv_valid=kv_valid)
        h = self.self_attn._children["out_proj"](sa["out_proj"],
                                                 attn.reshape(hidden.shape))
        hidden = self.self_attn_layer_norm(params["self_attn_layer_norm"],
                                           hidden + h)
        h = _prelu(self.fc1(params["fc1"], hidden), params["activation_fn"]["weight"])
        h = self.fc2(params["fc2"], h)
        return self.final_layer_norm(params["final_layer_norm"], hidden + h)


class DabDetrDecoderLayer(Module):
    def __init__(self, config, *, dtype, param_dtype, is_first=False):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.init_std))
        nkw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.hidden_size
        self.nhead = config.decoder_attention_heads
        self.is_first = is_first
        self.keep_query_pos = config.keep_query_pos
        from ..luke.modeling_luke import _Container

        sa = {
            "self_attn_query_content_proj": Linear(d, d, True, **kw),
            "self_attn_query_pos_proj": Linear(d, d, True, **kw),
            "self_attn_key_content_proj": Linear(d, d, True, **kw),
            "self_attn_key_pos_proj": Linear(d, d, True, **kw),
            "self_attn_value_proj": Linear(d, d, True, **kw),
            "self_attn": _OutProj(d, **nkw),
            "self_attn_layer_norm": LayerNorm(d, **nkw),
        }
        ca = {
            "cross_attn_query_content_proj": Linear(d, d, True, **kw),
            "cross_attn_key_content_proj": Linear(d, d, True, **kw),
            "cross_attn_key_pos_proj": Linear(d, d, True, **kw),
            "cross_attn_value_proj": Linear(d, d, True, **kw),
            "cross_attn_query_pos_sine_proj": Linear(d, d, True, **kw),
            "cross_attn": _OutProj(d, **nkw),
            "cross_attn_layer_norm": LayerNorm(d, **nkw),
        }
        if is_first or config.keep_query_pos:
            ca["cross_attn_query_pos_proj"] = Linear(d, d, True, **kw)
        self.self_attn = _Container(sa, **nkw)
        self.cross_attn = _Container(ca, **nkw)
        self.mlp = _DabFFN(config, **nkw)

    def __call__(self, params, hidden, query_pos, query_sine_embed,
                 enc_hidden, enc_pos, enc_valid):
        n = self.nhead
        sa_mods = self.self_attn._children
        sa = params["self_attn"]
        q = (sa_mods["self_attn_query_content_proj"](sa["self_attn_query_content_proj"], hidden)
             + sa_mods["self_attn_query_pos_proj"](sa["self_attn_query_pos_proj"], query_pos))
        k = (sa_mods["self_attn_key_content_proj"](sa["self_attn_key_content_proj"], hidden)
             + sa_mods["self_attn_key_pos_proj"](sa["self_attn_key_pos_proj"], query_pos))
        v = sa_mods["self_attn_value_proj"](sa["self_attn_value_proj"], hidden)
        head_dim = q.shape[-1] // n
        # reference DabDetrAttention pre-scales q then matmuls unscaled
        attn = eager_attention(_split_heads(q, n), _split_heads(k, n),
                               _split_heads(v, n), scale=head_dim ** -0.5,
                               is_causal=False)
        h = sa_mods["self_attn"](sa["self_attn"], attn.reshape(hidden.shape))
        hidden = sa_mods["self_attn_layer_norm"](sa["self_attn_layer_norm"],
                                                 hidden + h)

        ca_mods = self.cross_attn._children
        ca = params["cross_attn"]
        q_content = ca_mods["cross_attn_query_content_proj"](
            ca["cross_attn_query_content_proj"], hidden)
        k_content = ca_mods["cross_attn_key_content_proj"](
            ca["cross_attn_key_content_proj"], enc_hidden)
        v = ca_mods["cross_attn_value_proj"](ca["cross_attn_value_proj"], enc_hidden)
        k_pos = ca_mods["cross_attn_key_pos_proj"](ca["cross_attn_key_pos_proj"], enc_pos)
        if self.is_first or self.keep_query_pos:
            q_content = q_content + ca_mods["cross_attn_query_pos_proj"](
                ca["cross_attn_query_pos_proj"], query_pos)
            k_base = k_content + k_pos
        else:
            k_base = k_content
        b, nq, d = q_content.shape
        src = k_content.shape[1]
        sine = ca_mods["cross_attn_query_pos_sine_proj"](
            ca["cross_attn_query_pos_sine_proj"], query_sine_embed)
        q = jnp.concatenate([_split_heads(q_content, n), _split_heads(sine, n)],
                            axis=3).reshape(b, nq, 2 * d)
        k = jnp.concatenate([_split_heads(k_base, n), _split_heads(k_pos, n)],
                            axis=3).reshape(b, src, 2 * d)
        head_dim = (2 * d) // n
        attn = eager_attention(_split_heads(q, n), _split_heads(k, n),
                               _split_heads(v, n), scale=head_dim ** -0.5,
                               is_causal=False, kv_valid=enc_valid)
        h = ca_mods["cross_attn"](ca["cross_attn"], attn.reshape(b, nq, d))
        hidden = ca_mods["cross_attn_layer_norm"](ca["cross_attn_layer_norm"],
                                                  hidden + h)
        return self.mlp(params["mlp"], hidden)


class _DabFFN(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.init_std))
        d = config.hidden_size
        self.fc1 = Linear(d, config.decoder_ffn_dim, True, **kw)
        self.fc2 = Linear(config.decoder_ffn_dim, d, True, **kw)
        self.final_layer_norm = LayerNorm(d, dtype=dtype, param_dtype=param_dtype)

    def init(self, rng):
        params = super().init(rng)
        params["activation_fn"] = {"weight": jnp.full((1,), 0.25, self.param_dtype)}
        return params

    def __call__(self, params, hidden):
        h = _prelu(self.fc1(params["fc1"], hidden), params["activation_fn"]["weight"])
        h = self.fc2(params["fc2"], h)
        return self.final_layer_norm(params["final_layer_norm"], hidden + h)


class DabDetrPreTrainedModel(PreTrainedModel):
    config_class = DabDetrConfig
    base_model_prefix = "model"
    main_input_name = "pixel_values"
    _keys_to_ignore_on_load_unexpected = (r"num_batches_tracked",)
    # decoder.bbox_embed aliases the top-level bbox_predictor
    _weight_rules = (
        WeightRule(pattern=r"^model\.decoder\.bbox_embed\.",
                   rename="bbox_predictor."),
    )


class DabDetrModel(Module):
    def __init__(self, config: DabDetrConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        from ..luke.modeling_luke import _Container

        conv_enc = Module(**kw)
        conv_enc._children["model"] = ResNetModel(config.backbone_config, **kw)
        names = config.backbone_config.stage_names
        sizes = [config.backbone_config.embedding_size] + list(config.backbone_config.hidden_sizes)
        self._out_stage = names.index(config.backbone_config.out_features[-1])
        out_ch = sizes[self._out_stage]
        self.backbone = _Container({"conv_encoder": conv_enc}, **kw)
        self.input_projection = Conv(out_ch, config.hidden_size, 1, stride=1,
                                     padding=0, use_bias=True, ndim=2, **kw)
        self.query_refpoint_embeddings = Embedding(
            config.num_queries, config.query_dim,
            embedding_init=normal_init(config.init_std), **kw)
        d = config.hidden_size
        enc = Module(**kw)
        enc._children["query_scale"] = DetrMLPPredictionHead(d, d, d, 2, **kw)
        from ...core.module import ModuleList

        enc._children["layers"] = ModuleList(
            [DabDetrEncoderLayer(config, **kw) for _ in range(config.encoder_layers)])
        self.encoder = enc
        dec = Module(**kw)
        dec._children["layers"] = ModuleList(
            [DabDetrDecoderLayer(config, is_first=(i == 0), **kw)
             for i in range(config.decoder_layers)])
        dec._children["layernorm"] = LayerNorm(d, **kw)
        dec._children["query_scale"] = DetrMLPPredictionHead(d, d, d, 2, **kw)
        dec._children["ref_point_head"] = DetrMLPPredictionHead(
            config.query_dim // 2 * d, d, d, 2, **kw)
        dec._children["ref_anchor_head"] = DetrMLPPredictionHead(d, d, 2, 2, **kw)
        self.decoder = dec
        # set by ForObjectDetection for in-decoder anchor refinement
        self.bbox_embed_module = None
        self._children.pop("bbox_embed_module", None)

    def __call__(self, params, pixel_values, pixel_mask=None, bbox_params=None):
        cfg = self.config
        resnet = self.backbone._children["conv_encoder"]._children["model"]
        rp = params["backbone"]["conv_encoder"]["model"]
        x = resnet.embedder(rp["embedder"], jnp.asarray(pixel_values, self.dtype))
        _, hidden_states = resnet.encoder(rp["encoder"], x)
        feat = hidden_states[self._out_stage]
        b, _, h, w = feat.shape
        proj = self.input_projection(params["input_projection"], feat)
        flat = proj.reshape(b, cfg.hidden_size, h * w).transpose(0, 2, 1)
        mask = jnp.ones((b, h, w), bool) if pixel_mask is None else (
            jax.image.resize(pixel_mask.astype(jnp.float32), (b, h, w),
                             method="nearest") > 0.5)
        scale = cfg.sine_position_embedding_scale or (2 * math.pi)
        pos = _sine_pos_2d(mask, cfg.hidden_size // 2, cfg.temperature_height,
                           cfg.temperature_width, scale)
        pos = pos.reshape(b, h * w, cfg.hidden_size).astype(flat.dtype)
        kv_valid = mask.reshape(b, h * w).astype(jnp.int32)

        # encoder: per-layer pos scaled by query_scale(hidden)
        hidden = flat
        for i, layer in enumerate(self.encoder._children["layers"]._children.values()):
            pos_scale = self.encoder._children["query_scale"](
                params["encoder"]["query_scale"], hidden)
            hidden = layer(params["encoder"]["layers"][str(i)], hidden,
                           pos * pos_scale, kv_valid)
        enc_out = hidden

        refs = jnp.broadcast_to(
            params["query_refpoint_embeddings"]["weight"].astype(jnp.float32)[None],
            (b, cfg.num_queries, cfg.query_dim))
        reference_points = jax.nn.sigmoid(refs)
        dec_hidden = jnp.zeros((b, cfg.num_queries, cfg.hidden_size), flat.dtype)
        dmods = self.decoder._children
        dparams = params["decoder"]
        intermediate = []
        ref_list = [reference_points]
        for i, layer in enumerate(dmods["layers"]._children.values()):
            obj_center = reference_points[..., : cfg.query_dim]
            qse_full = gen_sine_position_embeddings(obj_center, cfg.hidden_size)
            qse_full = qse_full.astype(flat.dtype)
            query_pos = dmods["ref_point_head"](dparams["ref_point_head"], qse_full)
            if i == 0:
                pos_transform = 1.0
            else:
                pos_transform = dmods["query_scale"](dparams["query_scale"], dec_hidden)
            qse = qse_full[..., : cfg.hidden_size] * pos_transform
            ref_hw = jax.nn.sigmoid(
                dmods["ref_anchor_head"](dparams["ref_anchor_head"], dec_hidden))
            half = cfg.hidden_size // 2
            qse = jnp.concatenate([
                qse[..., :half] * (ref_hw[..., 1] / obj_center[..., 3])[..., None],
                qse[..., half:] * (ref_hw[..., 0] / obj_center[..., 2])[..., None],
            ], axis=-1)
            dec_hidden = layer(dparams["layers"][str(i)], dec_hidden, query_pos,
                               qse, enc_out, pos, kv_valid)
            if self.bbox_embed_module is not None and bbox_params is not None:
                delta = self.bbox_embed_module(bbox_params, dec_hidden)
                new_ref = jax.nn.sigmoid(
                    delta[..., : cfg.query_dim]
                    + inverse_sigmoid(reference_points))
                if i != len(dmods["layers"]._children) - 1:
                    ref_list.append(new_ref)
                reference_points = jax.lax.stop_gradient(new_ref)
            intermediate.append(
                dmods["layernorm"](dparams["layernorm"], dec_hidden))
        inter = jnp.stack(intermediate)        # [L, B, Q, D]
        ref_stack = jnp.stack(ref_list)        # [L, B, Q, 4]
        return DabDetrModelOutput(last_hidden_state=inter[-1],
                                  intermediate_hidden_states=inter,
                                  reference_points=ref_stack)


class DabDetrModelStandalone(DabDetrPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.model = DabDetrModel(config, dtype=self.dtype,
                                  param_dtype=self.param_dtype)

    def __call__(self, params, pixel_values=None, pixel_mask=None, **kwargs):
        return self.model(params["model"], pixel_values, pixel_mask)


class DabDetrForObjectDetection(DabDetrPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.model = DabDetrModel(config, **kw)
        self.class_embed = Linear(config.hidden_size, config.num_labels, True,
                                  kernel_init=normal_init(config.init_std), **kw)
        self.bbox_predictor = DetrMLPPredictionHead(
            config.hidden_size, config.hidden_size, 4, 3, **kw)
        self.model.bbox_embed_module = self.bbox_predictor
        # shared module, params routed in at call time — not a model child
        self.model._children.pop("bbox_embed_module", None)

    def __call__(self, params, pixel_values=None, pixel_mask=None, labels=None,
                 **kwargs) -> DabDetrObjectDetectionOutput:
        out = self.model(params["model"], pixel_values, pixel_mask,
                         bbox_params=params["bbox_predictor"])
        logits = self.class_embed(params["class_embed"],
                                  out.intermediate_hidden_states[-1])
        ref_before = inverse_sigmoid(out.reference_points)
        delta = self.bbox_predictor(params["bbox_predictor"],
                                    out.intermediate_hidden_states)
        coords = jax.nn.sigmoid(
            delta.at[..., : self.config.query_dim].add(ref_before)
            [..., : self.config.query_dim])
        pred_boxes = coords[-1]
        loss = None
        if labels is not None:
            from ...loss.object_detection import _deformable_level_loss

            parts = _deformable_level_loss(logits, pred_boxes, labels, self.config)
            loss = (self.config.cls_loss_coefficient * parts["loss_ce"]
                    + self.config.bbox_loss_coefficient * parts["loss_bbox"]
                    + self.config.giou_loss_coefficient * parts["loss_giou"])
        return DabDetrObjectDetectionOutput(loss=loss, logits=logits,
                                            pred_boxes=pred_boxes)
