"""MaskFormer (reference models/maskformer/modeling_maskformer.py): mask
classification for universal segmentation — a Swin backbone feeds an FPN pixel
decoder for per-pixel embeddings, a DETR decoder over learned queries reads
the final backbone map, and each query predicts a class plus a mask embedding
dotted against the pixel embeddings. Hungarian-matched CE+focal+dice loss."""

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
from ..detr.modeling_detr import DetrDecoderLayer
from ..luke.modeling_luke import _Container
from ..swin.modeling_swin import SWIN_WEIGHT_RULES, SwinEmbeddings, SwinEncoder
from .configuration_maskformer import MaskFormerConfig


@dataclass
class MaskFormerModelOutput(ModelOutput):
    encoder_last_hidden_state: Optional[jnp.ndarray] = None
    pixel_decoder_last_hidden_state: Optional[jnp.ndarray] = None
    transformer_decoder_last_hidden_state: Optional[jnp.ndarray] = None
    transformer_decoder_hidden_states: Optional[tuple] = None


@dataclass
class MaskFormerForInstanceSegmentationOutput(ModelOutput):
    loss: Optional[jnp.ndarray] = None
    class_queries_logits: Optional[jnp.ndarray] = None
    masks_queries_logits: Optional[jnp.ndarray] = None
    auxiliary_logits: Optional[list] = None


def sine_position_embedding(h, w, num_pos_feats, normalize=True, scale=None,
                            temperature=10000):
    """MaskFormerSinePositionEmbedding (normalize=True variant)."""
    scale = 2 * math.pi if scale is None else scale
    y = np.arange(1, h + 1, dtype=np.float32)[:, None] * np.ones((1, w), np.float32)
    x = np.arange(1, w + 1, dtype=np.float32)[None, :] * np.ones((h, 1), np.float32)
    if normalize:
        eps = 1e-6
        y = y / (y[-1:, :] + eps) * scale
        x = x / (x[:, -1:] + eps) * scale
    dim_t = np.arange(num_pos_feats, dtype=np.float32)
    dim_t = temperature ** (2 * np.floor(dim_t / 2) / num_pos_feats)
    pos_x = x[:, :, None] / dim_t
    pos_y = y[:, :, None] / dim_t
    pos_x = np.stack([np.sin(pos_x[:, :, 0::2]), np.cos(pos_x[:, :, 1::2])],
                     axis=3).reshape(h, w, -1)
    pos_y = np.stack([np.sin(pos_y[:, :, 0::2]), np.cos(pos_y[:, :, 1::2])],
                     axis=3).reshape(h, w, -1)
    pos = np.concatenate([pos_y, pos_x], axis=2)  # [H, W, 2*feats]
    return jnp.asarray(pos.reshape(h * w, -1))


def _nearest_resize(x, size):
    idx_h = np.floor(np.arange(size[0]) * (x.shape[-2] / size[0])).astype(np.int64)
    idx_w = np.floor(np.arange(size[1]) * (x.shape[-1] / size[1])).astype(np.int64)
    return jnp.take(jnp.take(x, jnp.asarray(idx_h), axis=-2),
                    jnp.asarray(idx_w), axis=-1)


class MaskFormerFPNConvLayer(Module):
    """conv(no bias) + GroupNorm(32) + ReLU, checkpoint names "0"/"1"."""

    def __init__(self, cin, cout, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self._mods = _Container({
            "0": Conv(cin, cout, 3, padding=1, use_bias=False, ndim=2, **kw),
            "1": GroupNorm(32, cout, 1e-5, **kw)}, **kw)
        self._children.clear()
        for k, v in self._mods._children.items():
            self._children[k] = v

    def __call__(self, params, x):
        h = self._children["0"](params["0"], x)
        h = self._children["1"](params["1"], h)
        return jax.nn.relu(h)


class MaskFormerFPNLayer(Module):
    def __init__(self, in_features, lateral_features, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.proj = _Container({
            "0": Conv(lateral_features, in_features, 1, use_bias=False, ndim=2, **kw),
            "1": GroupNorm(32, in_features, 1e-5, **kw)}, **kw)
        self.block = MaskFormerFPNConvLayer(in_features, in_features, **kw)

    def __call__(self, params, down, left):
        mods = self.proj._children
        left = mods["1"](params["proj"]["1"],
                         mods["0"](params["proj"]["0"], left))
        down = _nearest_resize(down, left.shape[-2:])
        return self.block(params["block"], down + left)


class MaskFormerFPNModel(Module):
    def __init__(self, in_features, lateral_widths, feature_size, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.stem = MaskFormerFPNConvLayer(in_features, feature_size, **kw)
        self.layers = [MaskFormerFPNLayer(feature_size, w, **kw)
                       for w in lateral_widths[::-1]]

    def __call__(self, params, features):
        fpn_features = []
        output = self.stem(params["stem"], features[-1])
        for i, (layer, left) in enumerate(zip(self.layers, features[:-1][::-1])):
            output = layer(params["layers"][str(i)], output, left)
            fpn_features.append(output)
        return fpn_features


class MaskFormerPixelDecoder(Module):
    def __init__(self, in_features, lateral_widths, feature_size,
                 mask_feature_size, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.fpn = MaskFormerFPNModel(in_features, lateral_widths,
                                      feature_size, **kw)
        self.mask_projection = Conv(feature_size, mask_feature_size, 3,
                                    padding=1, ndim=2, **kw)

    def __call__(self, params, features):
        fpn_features = self.fpn(params["fpn"], features)
        return self.mask_projection(params["mask_projection"], fpn_features[-1])


class _MaskFormerSwinBackbone(Module):
    """MaskFormerSwinBackbone analog: standard Swin tree under ``model`` +
    per-stage LayerNorms on the pre-downsample block outputs."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        g = config.image_size // config.patch_size
        num_features = [int(config.embed_dim * 2 ** i)
                        for i in range(len(config.depths))]
        self.channels = num_features
        self.model = _Container({
            "embeddings": SwinEmbeddings(config, **kw),
            "encoder": SwinEncoder(config, (g, g), **kw),
            "layernorm": LayerNorm(num_features[-1], config.layer_norm_eps, **kw),
        }, **kw)
        self.hidden_states_norms = [LayerNorm(c, 1e-5, **kw)
                                    for c in num_features]

    def __call__(self, params, pixel_values):
        mods = self.model._children
        p = params["model"]
        hidden, dims = mods["embeddings"](p["embeddings"], pixel_values)
        encoder = mods["encoder"]
        feature_maps = []
        h, w = dims
        for i, stage in enumerate(encoder.layers):
            hidden, before = stage(p["encoder"]["layers"][str(i)], hidden)
            normed = self.hidden_states_norms[i](
                params["hidden_states_norms"][str(i)], before)
            b, _, c = normed.shape
            feature_maps.append(normed.transpose(0, 2, 1).reshape(b, c, h, w))
            h, w = max(1, h // 2), max(1, w // 2)
        return feature_maps


class MaskFormerTransformerModule(Module):
    def __init__(self, in_features, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        dec = config.decoder_config
        hidden_size = dec.d_model
        self.hidden_size = hidden_size
        self.queries_embedder = Embedding(dec.num_queries, hidden_size, **kw)
        self.input_projection = (Conv(in_features, hidden_size, 1, ndim=2, **kw)
                                 if in_features != hidden_size else None)
        self._layers = [DetrDecoderLayer(dec, **kw)
                        for _ in range(dec.decoder_layers)]
        self._children.pop("_layers", None)
        self.decoder = _Container({
            "layers": ModuleList(self._layers),
            "layernorm": LayerNorm(hidden_size, 1e-5, **kw)}, **kw)

    def __call__(self, params, image_features):
        if self.input_projection is not None:
            image_features = self.input_projection(params["input_projection"],
                                                   image_features)
        b, c, h, w = image_features.shape
        queries_pos = jnp.broadcast_to(
            params["queries_embedder"]["weight"][None],
            (b,) + params["queries_embedder"]["weight"].shape).astype(image_features.dtype)
        hidden = jnp.zeros_like(queries_pos)
        spatial_pos = sine_position_embedding(h, w, self.hidden_size // 2)[None]
        spatial_pos = jnp.broadcast_to(spatial_pos, (b, h * w, c)).astype(image_features.dtype)
        enc = image_features.reshape(b, c, h * w).transpose(0, 2, 1)
        ln = self.decoder._children["layernorm"]
        pdec = params["decoder"]
        intermediates = []
        for i, layer in enumerate(self._layers):
            hidden = layer(pdec["layers"][str(i)], hidden, queries_pos, enc,
                           spatial_pos, None)
            intermediates.append(ln(pdec["layernorm"], hidden))
        return intermediates[-1], tuple(intermediates)


class MaskFormerPreTrainedModel(PreTrainedModel):
    config_class = MaskFormerConfig
    base_model_prefix = "model"
    main_input_name = "pixel_values"
    _weight_rules = SWIN_WEIGHT_RULES
    _keys_to_ignore_on_load_unexpected = (r"relative_position_index",
                                          r"empty_weight$")


class _MaskFormerCore(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        backbone = _MaskFormerSwinBackbone(config.backbone_config, **kw)
        channels = backbone.channels
        decoder = MaskFormerPixelDecoder(channels[-1], channels[:-1],
                                         config.fpn_feature_size,
                                         config.mask_feature_size, **kw)
        self.pixel_level_module = _Container({"encoder": backbone,
                                              "decoder": decoder}, **kw)
        self.transformer_module = MaskFormerTransformerModule(
            channels[-1], config, **kw)

    def __call__(self, params, pixel_values):
        plm = self.pixel_level_module._children
        p = params["pixel_level_module"]
        features = plm["encoder"](p["encoder"], pixel_values)
        pixel_embeddings = plm["decoder"](p["decoder"], features)
        last, intermediates = self.transformer_module(
            params["transformer_module"], features[-1])
        return MaskFormerModelOutput(
            encoder_last_hidden_state=features[-1],
            pixel_decoder_last_hidden_state=pixel_embeddings,
            transformer_decoder_last_hidden_state=last,
            transformer_decoder_hidden_states=intermediates)


class MaskFormerModel(MaskFormerPreTrainedModel):
    def __init__(self, config: MaskFormerConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        core = _MaskFormerCore(config, dtype=self.dtype, param_dtype=self.param_dtype)
        for name, child in core._children.items():
            setattr(self, name, child)
        self._core = core
        self._children.pop("_core", None)

    def __call__(self, params, pixel_values=None, **kwargs) -> MaskFormerModelOutput:
        return self._core(params, jnp.asarray(pixel_values, self.dtype))


def _dice_loss(inputs, labels, num_masks):
    probs = jax.nn.sigmoid(inputs)
    numerator = 2 * (probs * labels).sum(-1)
    denominator = probs.sum(-1) + labels.sum(-1)
    return (1 - (numerator + 1) / (denominator + 1)).sum() / num_masks


def _sigmoid_focal_loss(inputs, labels, num_masks, alpha=0.25, gamma=2):
    probs = jax.nn.sigmoid(inputs)
    ce = jnp.maximum(inputs, 0) - inputs * labels + jnp.log1p(jnp.exp(-jnp.abs(inputs)))
    p_t = probs * labels + (1 - probs) * (1 - labels)
    loss = ce * ((1 - p_t) ** gamma)
    loss = loss * (alpha * labels + (1 - alpha) * (1 - labels))
    return loss.mean(1).sum() / num_masks


def _pairwise_focal(pred, tgt, alpha=0.25, gamma=2):
    """[Q, HW] x [T, HW] -> [Q, T] mean-over-pixels focal cost."""
    prob = jax.nn.sigmoid(pred)
    ce_pos = jnp.maximum(pred, 0) - pred + jnp.log1p(jnp.exp(-jnp.abs(pred)))
    ce_neg = jnp.maximum(pred, 0) + jnp.log1p(jnp.exp(-jnp.abs(pred)))
    focal_pos = alpha * ((1 - prob) ** gamma) * ce_pos
    focal_neg = (1 - alpha) * (prob ** gamma) * ce_neg
    hw = pred.shape[1]
    return (focal_pos @ tgt.T + focal_neg @ (1 - tgt).T) / hw


def _pairwise_dice(pred, tgt):
    prob = jax.nn.sigmoid(pred)
    numerator = 2 * (prob @ tgt.T)
    denominator = prob.sum(-1)[:, None] + tgt.sum(-1)[None, :]
    return 1 - (numerator + 1) / (denominator + 1)


class MaskFormerForInstanceSegmentation(MaskFormerPreTrainedModel):
    def __init__(self, config: MaskFormerConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        lkw = dict(**kw, kernel_init=normal_init(0.02))
        self.model = _MaskFormerCore(config, **kw)
        hidden = config.decoder_config.d_model
        self.class_predictor = Linear(hidden, config.num_labels + 1, True, **lkw)
        mask_dim = config.mask_feature_size
        self.mask_embedder = _Container({
            "0": _Container({"0": Linear(hidden, hidden, True, **lkw)}, **kw),
            "1": _Container({"0": Linear(hidden, hidden, True, **lkw)}, **kw),
            "2": _Container({"0": Linear(hidden, mask_dim, True, **lkw)}, **kw),
        }, **kw)

    def _mask_embed(self, params, h):
        mods = self.mask_embedder._children
        p = params["mask_embedder"]
        h = jax.nn.relu(mods["0"]._children["0"](p["0"]["0"], h))
        h = jax.nn.relu(mods["1"]._children["0"](p["1"]["0"], h))
        return mods["2"]._children["0"](p["2"]["0"], h)

    def _loss(self, params, masks_logits, class_logits, mask_labels,
              class_labels, aux_logits):
        from scipy.optimize import linear_sum_assignment

        cfg = self.config
        losses_total = 0.0
        all_outputs = [(masks_logits, class_logits)]
        if aux_logits:
            all_outputs += [(a["masks_queries_logits"], a["class_queries_logits"])
                            for a in aux_logits]
        num_masks = max(sum(len(c) for c in class_labels), 1)
        empty_weight = np.ones(cfg.num_labels + 1, np.float32)
        empty_weight[-1] = cfg.no_object_weight
        total = 0.0
        for masks_q, class_q in all_outputs:
            indices = []
            for b in range(len(class_labels)):
                tgt = _nearest_resize(jnp.asarray(mask_labels[b], jnp.float32),
                                      masks_q.shape[-2:])
                pm = masks_q[b].reshape(masks_q.shape[1], -1)
                tm = tgt.reshape(tgt.shape[0], -1)
                probs = jax.nn.softmax(class_q[b].astype(jnp.float32), -1)
                cost_class = -probs[:, jnp.asarray(class_labels[b])]
                cost = (np.asarray(_pairwise_focal(pm, tm))
                        + np.asarray(cost_class)
                        + np.asarray(_pairwise_dice(pm, tm)))
                indices.append(linear_sum_assignment(cost))
            # class CE with empty weight
            bsz, q, _ = class_q.shape
            target = np.full((bsz, q), cfg.num_labels, np.int64)
            for b, (src, tgt_i) in enumerate(indices):
                target[b, src] = np.asarray(class_labels[b])[tgt_i]
            logp = jax.nn.log_softmax(class_q.astype(jnp.float32), -1)
            w = jnp.asarray(empty_weight)[jnp.asarray(target)]
            nll = -jnp.take_along_axis(logp, jnp.asarray(target)[..., None],
                                       axis=-1)[..., 0]
            loss_ce = (nll * w).sum() / w.sum()
            # mask losses on matched pairs at LABEL resolution
            pred_list, tgt_list = [], []
            for b, (src, tgt_i) in enumerate(indices):
                lb = jnp.asarray(mask_labels[b], jnp.float32)
                pred = masks_q[b][jnp.asarray(src)]
                from ..upernet.modeling_upernet import _bilinear

                pred = _bilinear(pred[None], lb.shape[-2:])[0]
                pred_list.append(pred.reshape(pred.shape[0], -1))
                tgt_list.append(lb[jnp.asarray(tgt_i)].reshape(len(tgt_i), -1))
            preds = jnp.concatenate(pred_list)
            tgts = jnp.concatenate(tgt_list)
            total = total + cfg.cross_entropy_weight * loss_ce
            total = total + cfg.mask_weight * _sigmoid_focal_loss(preds, tgts, num_masks)
            total = total + cfg.dice_weight * _dice_loss(preds, tgts, num_masks)
        return total

    def __call__(self, params, pixel_values=None, mask_labels=None,
                 class_labels=None, pixel_mask=None,
                 output_auxiliary_logits=None,
                 **kwargs) -> MaskFormerForInstanceSegmentationOutput:
        outputs = self.model(params["model"],
                             jnp.asarray(pixel_values, self.dtype))
        pixel_embeddings = outputs.pixel_decoder_last_hidden_state
        aux_logits = []
        if self.config.use_auxiliary_loss:
            stacked = jnp.stack(outputs.transformer_decoder_hidden_states)
            classes = self.class_predictor(params["class_predictor"], stacked)
            class_queries_logits = classes[-1]
            mask_emb = self._mask_embed(params, stacked)
            binaries = jnp.einsum("lbqc,bchw->lbqhw", mask_emb, pixel_embeddings)
            masks_queries_logits = binaries[-1]
            for am, ac in zip(binaries[:-1], classes[:-1]):
                aux_logits.append({"masks_queries_logits": am,
                                   "class_queries_logits": ac})
        else:
            h = outputs.transformer_decoder_last_hidden_state
            class_queries_logits = self.class_predictor(params["class_predictor"], h)
            mask_emb = self._mask_embed(params, h)
            masks_queries_logits = jnp.einsum("bqc,bchw->bqhw", mask_emb,
                                              pixel_embeddings)
        loss = None
        if mask_labels is not None and class_labels is not None:
            loss = self._loss(params, masks_queries_logits, class_queries_logits,
                              mask_labels, class_labels, aux_logits)
        return MaskFormerForInstanceSegmentationOutput(
            loss=loss, class_queries_logits=class_queries_logits,
            masks_queries_logits=masks_queries_logits,
            auxiliary_logits=aux_logits or None)
