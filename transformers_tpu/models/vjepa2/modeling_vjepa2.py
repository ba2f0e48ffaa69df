"""V-JEPA2 — self-supervised video encoder + predictor, TPU-native (reference
src/transformers/models/vjepa2/modeling_vjepa2.py).

3D tubelet patching (:84), 3-axis factorized video RoPE over frame/height/
width position components (:184 rotate_queries_or_keys — note its tiled
cos/sin vs interleaved pair rotation layout, replicated exactly), a JEPA
predictor that sorts context+mask tokens by position id (:551), and an
attentive probe pooler for classification (:823)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from ...core.module import Conv, LayerNorm, Linear, Module
from ...modeling_outputs import BaseModelOutput, ModelOutput, SequenceClassifierOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from .configuration_vjepa2 import VJEPA2Config


@dataclass
class VJEPA2ModelOutput(ModelOutput):
    last_hidden_state: Optional[jnp.ndarray] = None
    masked_hidden_state: Optional[jnp.ndarray] = None
    predictor_last_hidden_state: Optional[jnp.ndarray] = None
    predictor_target_hidden_state: Optional[jnp.ndarray] = None


def rotate_queries_or_keys(x, pos):
    """reference :184 — tiled cos/sin, interleaved pair rotation."""
    d = x.shape[-1]
    omega = jnp.arange(d // 2, dtype=jnp.float32) / (d / 2.0)
    omega = 1.0 / 10000.0**omega
    freq = pos[..., None].astype(jnp.float32) * omega  # [..., N, D/2]
    sin = jnp.tile(jnp.sin(freq), (1,) * (freq.ndim - 1) + (2,))
    cos = jnp.tile(jnp.cos(freq), (1,) * (freq.ndim - 1) + (2,))
    y = x.reshape(x.shape[:-1] + (-1, 2))
    y1, y2 = y[..., 0], y[..., 1]
    y = jnp.stack([-y2, y1], axis=-1).reshape(x.shape)
    return (x.astype(jnp.float32) * cos + y.astype(jnp.float32) * sin).astype(x.dtype)


class VJEPA2PatchEmbeddings3D(Module):
    def __init__(self, config, hidden_size, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        k = (config.tubelet_size, config.patch_size, config.patch_size)
        self.proj = Conv(config.in_chans, hidden_size, k, stride=k, ndim=3,
                         dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, pixel_values_videos):
        # [B, C, T, H, W] -> [B, N, hidden]
        h = self.proj(params["proj"], pixel_values_videos)
        b, c = h.shape[:2]
        return jnp.swapaxes(h.reshape(b, c, -1), 1, 2)


class VJEPA2Embeddings(Module):
    def __init__(self, config, hidden_size, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.patch_embeddings = VJEPA2PatchEmbeddings3D(
            config, hidden_size, dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, pixel_values_videos):
        # [B, T, C, H, W] -> [B, C, T, H, W]
        x = jnp.transpose(pixel_values_videos, (0, 2, 1, 3, 4))
        if x.shape[2] < self.config.tubelet_size:
            x = jnp.tile(x, (1, 1, self.config.tubelet_size, 1, 1))
        return self.patch_embeddings(params["patch_embeddings"], x)


class VJEPA2RopeAttention(Module):
    """3-axis factorized rope attention (reference :207)."""

    def __init__(self, config, hidden_size, num_heads, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.heads = num_heads
        self.head_dim = hidden_size // num_heads
        self.query = Linear(hidden_size, hidden_size, use_bias=config.qkv_bias, **kw)
        self.key = Linear(hidden_size, hidden_size, use_bias=config.qkv_bias, **kw)
        self.value = Linear(hidden_size, hidden_size, use_bias=config.qkv_bias, **kw)
        self.proj = Linear(hidden_size, hidden_size, **kw)
        self.grid_size = config.crop_size // config.patch_size
        self.grid_depth = config.frames_per_clip // config.tubelet_size
        self.d_dim = int(2 * ((self.head_dim // 3) // 2))
        self.h_dim = self.d_dim
        self.w_dim = self.d_dim
        self.scaling = self.head_dim**-0.5

    def _position_ids(self, n_tokens, position_mask):
        per_frame = self.grid_size * self.grid_size
        if position_mask is not None:
            ids = jnp.tile(position_mask[:, None, :], (1, self.heads, 1))
        else:
            ids = jnp.arange(n_tokens)
        frame_ids = ids // per_frame
        rem = ids - per_frame * frame_ids
        height_ids = rem // self.grid_size
        width_ids = rem - self.grid_size * height_ids
        return frame_ids, height_ids, width_ids

    def _apply_rope(self, qk, pos_ids):
        d_pos, h_pos, w_pos = pos_ids
        s = 0
        parts = []
        for dim, pos in ((self.d_dim, d_pos), (self.h_dim, h_pos), (self.w_dim, w_pos)):
            parts.append(rotate_queries_or_keys(qk[..., s : s + dim], pos))
            s += dim
        if s < self.head_dim:
            parts.append(qk[..., s:])
        return jnp.concatenate(parts, axis=-1)

    def __call__(self, params, hidden, position_mask=None):
        b, n, _ = hidden.shape
        split = lambda x: jnp.swapaxes(x.reshape(b, n, self.heads, self.head_dim), 1, 2)
        q = split(self.query(params["query"], hidden))
        k = split(self.key(params["key"], hidden))
        v = split(self.value(params["value"], hidden))
        pos_ids = self._position_ids(n, position_mask)
        q = self._apply_rope(q, pos_ids)
        k = self._apply_rope(k, pos_ids)
        w = jnp.einsum("bhtd,bhsd->bhts", q, k) * self.scaling
        p = jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(w.dtype)
        out = jnp.einsum("bhts,bhsd->bhtd", p, v)
        out = jnp.swapaxes(out, 1, 2).reshape(b, n, -1)
        return self.proj(params["proj"], out)


class VJEPA2MLP(Module):
    def __init__(self, config, hidden_size, mlp_ratio=4.0, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        inner = int(hidden_size * mlp_ratio)
        self.fc1 = Linear(hidden_size, inner, **kw)
        self.fc2 = Linear(inner, hidden_size, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, x):
        return self.fc2(params["fc2"], self.act(self.fc1(params["fc1"], x)))


class VJEPA2Layer(Module):
    def __init__(self, config, hidden_size, num_heads, mlp_ratio, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.norm1 = LayerNorm(hidden_size, config.layer_norm_eps, **kw)
        self.attention = VJEPA2RopeAttention(config, hidden_size, num_heads, **kw)
        self.norm2 = LayerNorm(hidden_size, config.layer_norm_eps, **kw)
        self.mlp = VJEPA2MLP(config, hidden_size, mlp_ratio, **kw)

    def __call__(self, params, hidden, position_mask=None):
        h = self.attention(params["attention"],
                           self.norm1(params["norm1"], hidden), position_mask)
        hidden = hidden + h
        h = self.mlp(params["mlp"], self.norm2(params["norm2"], hidden))
        return hidden + h


class VJEPA2Encoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embeddings = VJEPA2Embeddings(config, config.hidden_size, **kw)
        self.layer = [VJEPA2Layer(config, config.hidden_size,
                                  config.num_attention_heads, config.mlp_ratio, **kw)
                      for _ in range(config.num_hidden_layers)]
        self.layernorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)

    def __call__(self, params, pixel_values_videos):
        h = self.embeddings(params["embeddings"], pixel_values_videos)
        for i, layer in enumerate(self.layer):
            h = layer(params["layer"][str(i)], h)
        return self.layernorm(params["layernorm"], h)


def apply_masks(tensor, masks):
    """Gather kept patches per mask and stack on batch (reference :465)."""
    out = []
    for mask in masks:
        idx = jnp.broadcast_to(mask[..., None], mask.shape + (tensor.shape[-1],))
        out.append(jnp.take_along_axis(tensor, idx, axis=1))
    return jnp.concatenate(out, axis=0)


class VJEPA2PredictorEmbeddings(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.predictor_embeddings = Linear(config.hidden_size, config.pred_hidden_size,
                                           dtype=dtype, param_dtype=param_dtype)

    def init(self, rng):
        params = super().init(rng)
        params["mask_tokens"] = jnp.zeros(
            (self.config.pred_num_mask_tokens, 1, 1, self.config.pred_hidden_size),
            self.param_dtype)
        return params

    def __call__(self, params, hidden, context_mask, target_mask, mask_index=1):
        b = hidden.shape[0]
        context = self.predictor_embeddings(params["predictor_embeddings"], hidden)
        mask_index = mask_index % self.config.pred_num_mask_tokens
        target_tok = params["mask_tokens"][mask_index].astype(context.dtype)
        max_patch = int(jnp.max(target_mask[0])) + 1
        target = jnp.tile(target_tok, (b, max_patch, 1))
        target = apply_masks(target, target_mask)
        context = jnp.tile(context, (len(context_mask), 1, 1))
        embeddings = jnp.concatenate([context, target], axis=1)
        cm = jnp.concatenate(context_mask, axis=0)
        tm = jnp.concatenate(target_mask, axis=0)
        return embeddings, jnp.concatenate([cm, tm], axis=1)


class VJEPA2Predictor(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embeddings = VJEPA2PredictorEmbeddings(config, **kw)
        self.layer = [VJEPA2Layer(config, config.pred_hidden_size,
                                  config.pred_num_attention_heads,
                                  config.pred_mlp_ratio, **kw)
                      for _ in range(config.pred_num_hidden_layers)]
        self.layernorm = LayerNorm(config.pred_hidden_size, config.layer_norm_eps, **kw)
        self.proj = Linear(config.pred_hidden_size, config.hidden_size, **kw)

    def __call__(self, params, encoder_hidden, context_mask, target_mask):
        encoder_hidden = apply_masks(encoder_hidden, context_mask)
        n_ctxt = encoder_hidden.shape[1]
        h, position_masks = self.embeddings(params["embeddings"], encoder_hidden,
                                            context_mask, target_mask)
        argsort = jnp.argsort(position_masks, axis=1)
        position_masks = jnp.take_along_axis(position_masks, argsort, axis=1)
        h = jnp.take_along_axis(
            h, jnp.broadcast_to(argsort[..., None], argsort.shape + (h.shape[-1],)),
            axis=1)
        for i, layer in enumerate(self.layer):
            h = layer(params["layer"][str(i)], h, position_masks)
        h = self.layernorm(params["layernorm"], h)
        reverse = jnp.argsort(argsort, axis=1)
        h = jnp.take_along_axis(
            h, jnp.broadcast_to(reverse[..., None], reverse.shape + (h.shape[-1],)),
            axis=1)
        h = h[:, n_ctxt:]
        return self.proj(params["proj"], h)


class VJEPA2PoolerSelfAttention(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        h = config.hidden_size
        self.heads = config.num_attention_heads
        self.head_dim = h // self.heads
        self.k_proj = Linear(h, h, **kw)
        self.v_proj = Linear(h, h, **kw)
        self.q_proj = Linear(h, h, **kw)
        self.out_proj = Linear(h, h, **kw)

    def __call__(self, params, hidden):
        b, n, d = hidden.shape
        split = lambda x: jnp.swapaxes(x.reshape(b, -1, self.heads, self.head_dim), 1, 2)
        q = split(self.q_proj(params["q_proj"], hidden))
        k = split(self.k_proj(params["k_proj"], hidden))
        v = split(self.v_proj(params["v_proj"], hidden))
        w = jnp.einsum("bhtd,bhsd->bhts", q, k) * self.head_dim**-0.5
        p = jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(w.dtype)
        out = jnp.swapaxes(jnp.einsum("bhts,bhsd->bhtd", p, v), 1, 2).reshape(b, n, d)
        return self.out_proj(params["out_proj"], out)


class VJEPA2PoolerCrossAttention(Module):
    """q from probes, k/v from patches; NO output projection (reference :688)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        h = config.hidden_size
        self.heads = config.num_attention_heads
        self.head_dim = h // self.heads
        self.k_proj = Linear(h, h, **kw)
        self.v_proj = Linear(h, h, **kw)
        self.q_proj = Linear(h, h, **kw)

    def __call__(self, params, queries, keys, values):
        b, nq, d = queries.shape
        split = lambda x: jnp.swapaxes(
            x.reshape(b, -1, self.heads, self.head_dim), 1, 2)
        q = split(self.q_proj(params["q_proj"], queries))
        k = split(self.k_proj(params["k_proj"], keys))
        v = split(self.v_proj(params["v_proj"], values))
        w = jnp.einsum("bhtd,bhsd->bhts", q, k) * self.head_dim**-0.5
        p = jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(w.dtype)
        out = jnp.swapaxes(jnp.einsum("bhts,bhsd->bhtd", p, v), 1, 2)
        return out.reshape(b, nq, d)


class VJEPA2PoolerSelfAttentionLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.layer_norm1 = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.self_attn = VJEPA2PoolerSelfAttention(config, **kw)
        self.layer_norm2 = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.mlp = VJEPA2MLP(config, config.hidden_size, 4.0, **kw)

    def __call__(self, params, hidden):
        h = self.self_attn(params["self_attn"],
                           self.layer_norm1(params["layer_norm1"], hidden))
        hidden = hidden + h
        h = self.mlp(params["mlp"], self.layer_norm2(params["layer_norm2"], hidden))
        return hidden + h


class VJEPA2PoolerCrossAttentionLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.layer_norm1 = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.cross_attn = VJEPA2PoolerCrossAttention(config, **kw)
        self.layer_norm2 = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.mlp = VJEPA2MLP(config, config.hidden_size, 4.0, **kw)

    def __call__(self, params, queries, hidden):
        normed = self.layer_norm1(params["layer_norm1"], hidden)
        out = queries + self.cross_attn(params["cross_attn"], queries, normed, normed)
        h = self.mlp(params["mlp"], self.layer_norm2(params["layer_norm2"], out))
        return out + h


class VJEPA2AttentivePooler(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.cross_attention_layer = VJEPA2PoolerCrossAttentionLayer(config, **kw)
        self.self_attention_layers = [VJEPA2PoolerSelfAttentionLayer(config, **kw)
                                      for _ in range(config.num_pooler_layers)]

    def init(self, rng):
        params = super().init(rng)
        params["query_tokens"] = jnp.zeros((1, 1, self.config.hidden_size),
                                           self.param_dtype)
        return params

    def __call__(self, params, hidden):
        for i, layer in enumerate(self.self_attention_layers):
            hidden = layer(params["self_attention_layers"][str(i)], hidden)
        queries = jnp.tile(params["query_tokens"].astype(hidden.dtype),
                           (hidden.shape[0], 1, 1))
        out = self.cross_attention_layer(params["cross_attention_layer"],
                                         queries, hidden)
        return out[:, 0]


class VJEPA2PreTrainedModel(PreTrainedModel):
    config_class = VJEPA2Config
    base_model_prefix = "vjepa2"
    main_input_name = "pixel_values_videos"


class VJEPA2Model(VJEPA2PreTrainedModel):
    def __init__(self, config: VJEPA2Config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.encoder = VJEPA2Encoder(config, **kw)
        self.predictor = VJEPA2Predictor(config, **kw)

    def __call__(self, params, pixel_values_videos, context_mask=None,
                 target_mask=None, skip_predictor=False, **kwargs):
        h = self.encoder(params["encoder"], pixel_values_videos)
        if context_mask is None and target_mask is None:
            b, n = h.shape[:2]
            full = jnp.broadcast_to(jnp.arange(n)[None], (b, n))
            context_mask, target_mask = [full], [full]
        pred = None
        tgt = None
        if not skip_predictor:
            pred = self.predictor(params["predictor"], h, context_mask, target_mask)
            tgt = apply_masks(h, target_mask)
        return VJEPA2ModelOutput(
            last_hidden_state=h,
            masked_hidden_state=apply_masks(h, context_mask),
            predictor_last_hidden_state=pred,
            predictor_target_hidden_state=tgt)


class VJEPA2ForVideoClassification(VJEPA2PreTrainedModel):
    def __init__(self, config: VJEPA2Config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.vjepa2 = _VJEPA2Core(config, **kw)
        self.pooler = VJEPA2AttentivePooler(config, **kw)
        self.classifier = Linear(config.hidden_size, config.num_labels, **kw)

    def __call__(self, params, pixel_values_videos=None, labels=None, **kwargs):
        h = self.vjepa2.encoder(params["vjepa2"]["encoder"], pixel_values_videos)
        pooled = self.pooler(params["pooler"], h)
        logits = self.classifier(params["classifier"], pooled)
        loss = None
        if labels is not None:
            from ...loss import for_sequence_classification_loss

            loss = for_sequence_classification_loss(logits, labels, self.config)
        return SequenceClassifierOutput(loss=loss, logits=logits)


class _VJEPA2Core(Module):
    """Full VJEPA2Model (encoder + predictor): the classification checkpoint
    carries predictor weights too (reference :981)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.encoder = VJEPA2Encoder(config, **kw)
        self.predictor = VJEPA2Predictor(config, **kw)
