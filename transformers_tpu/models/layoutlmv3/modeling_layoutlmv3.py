"""LayoutLMv3 — unified text+image doc-AI encoder, TPU-native (reference
src/transformers/models/layoutlmv3/modeling_layoutlmv3.py).

Text tokens carry concatenated 2D box embeddings (x0/y0/x1/y1/h/w,
reference :112); image patches join the same sequence with a synthetic
patch-grid bbox table (:585). Attention adds T5-style bucketed 1D relative
bias plus 2D spatial bias on box corners (:392-:456), and uses the CogView
PB-relax softmax (:228)."""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core.module import Conv, Embedding, LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import (
    BaseModelOutput,
    ModelOutput,
    QuestionAnsweringModelOutput,
    SequenceClassifierOutput,
    TokenClassifierOutput,
)
from ...modeling_utils import PreTrainedModel
from ..bart.modeling_bart import get_activation
from .configuration_layoutlmv3 import LayoutLMv3Config

NEG_INF = jnp.finfo(jnp.float32).min


class LayoutLMv3TextEmbeddings(Module):
    """reference :86."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  embedding_init=normal_init(config.initializer_range))
        h = config.hidden_size
        self.padding_idx = config.pad_token_id
        self.word_embeddings = Embedding(config.vocab_size, h, **kw)
        self.token_type_embeddings = Embedding(config.type_vocab_size, h, **kw)
        self.position_embeddings = Embedding(config.max_position_embeddings, h, **kw)
        self.x_position_embeddings = Embedding(config.max_2d_position_embeddings,
                                               config.coordinate_size, **kw)
        self.y_position_embeddings = Embedding(config.max_2d_position_embeddings,
                                               config.coordinate_size, **kw)
        self.h_position_embeddings = Embedding(config.max_2d_position_embeddings,
                                               config.shape_size, **kw)
        self.w_position_embeddings = Embedding(config.max_2d_position_embeddings,
                                               config.shape_size, **kw)
        self.LayerNorm = LayerNorm(h, config.layer_norm_eps,
                                   dtype=dtype, param_dtype=param_dtype)

    def spatial(self, params, bbox):
        left = self.x_position_embeddings(params["x_position_embeddings"], bbox[:, :, 0])
        upper = self.y_position_embeddings(params["y_position_embeddings"], bbox[:, :, 1])
        right = self.x_position_embeddings(params["x_position_embeddings"], bbox[:, :, 2])
        lower = self.y_position_embeddings(params["y_position_embeddings"], bbox[:, :, 3])
        h = self.h_position_embeddings(params["h_position_embeddings"],
                                       jnp.clip(bbox[:, :, 3] - bbox[:, :, 1], 0, 1023))
        w = self.w_position_embeddings(params["w_position_embeddings"],
                                       jnp.clip(bbox[:, :, 2] - bbox[:, :, 0], 0, 1023))
        return jnp.concatenate([left, upper, right, lower, h, w], axis=-1)

    def __call__(self, params, input_ids, bbox, token_type_ids=None, position_ids=None):
        if position_ids is None:
            mask = (input_ids != self.padding_idx).astype(jnp.int32)
            position_ids = jnp.cumsum(mask, axis=1) * mask + self.padding_idx
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        h = (self.word_embeddings(params["word_embeddings"], input_ids)
             + self.token_type_embeddings(params["token_type_embeddings"], token_type_ids)
             + self.position_embeddings(params["position_embeddings"], position_ids)
             + self.spatial(params, bbox))
        return self.LayerNorm(params["LayerNorm"], h)


class LayoutLMv3PatchEmbeddings(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        p = config.patch_size
        self.proj = Conv(config.num_channels, config.hidden_size, p, stride=p,
                         ndim=2, dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, pixel_values):
        h = self.proj(params["proj"], pixel_values)
        b, c = h.shape[:2]
        return jnp.swapaxes(h.reshape(b, c, -1), 1, 2)


def relative_position_bucket(relative_position, num_buckets=32, max_distance=128):
    """Bidirectional T5 buckets (reference :392)."""
    num_buckets //= 2
    ret = (relative_position > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(jnp.maximum(n, 1).astype(jnp.float32) / max_exact)
        / math.log(max_distance / max_exact) * (num_buckets - max_exact)).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


class LayoutLMv3SelfAttention(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        h = config.hidden_size
        self.heads = config.num_attention_heads
        self.head_size = h // self.heads
        self.query = Linear(h, h, **kw)
        self.key = Linear(h, h, **kw)
        self.value = Linear(h, h, **kw)
        self.has_rel = config.has_relative_attention_bias
        self.has_spatial = config.has_spatial_attention_bias

    def _split(self, x, b):
        return jnp.swapaxes(x.reshape(b, -1, self.heads, self.head_size), 1, 2)

    def __call__(self, params, hidden, attn_bias, rel_pos=None, rel_2d_pos=None):
        b = hidden.shape[0]
        q = self._split(self.query(params["query"], hidden), b)
        k = self._split(self.key(params["key"], hidden), b)
        v = self._split(self.value(params["value"], hidden), b)
        scores = jnp.einsum("bhtc,bhsc->bhts", q / math.sqrt(self.head_size), k)
        if self.has_rel and self.has_spatial:
            scores = scores + (rel_pos + rel_2d_pos) / math.sqrt(self.head_size)
        elif self.has_rel:
            scores = scores + rel_pos / math.sqrt(self.head_size)
        if attn_bias is not None:
            scores = scores + attn_bias
        # CogView PB-relax softmax (reference :228)
        alpha = 32.0
        scaled = scores / alpha
        scaled = (scaled - jnp.max(scaled, axis=-1, keepdims=True)) * alpha
        probs = jax.nn.softmax(scaled, axis=-1)
        out = jnp.einsum("bhts,bhsc->bhtc", probs, v)
        return jnp.swapaxes(out, 1, 2).reshape(b, -1, self.heads * self.head_size)


class LayoutLMv3Layer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        h = config.hidden_size
        self.attention = _Attention(config, **kw)
        self.intermediate = _Intermediate(config, **kw)
        self.output = _Output(config, **kw)

    def __call__(self, params, hidden, attn_bias, rel_pos, rel_2d_pos):
        h = self.attention(params["attention"], hidden, attn_bias, rel_pos, rel_2d_pos)
        inter = self.intermediate(params["intermediate"], h)
        return self.output(params["output"], inter, h)


class _Attention(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.self = LayoutLMv3SelfAttention(config, **kw)
        self.output = _SelfOutput(config, **kw)

    def __call__(self, params, hidden, attn_bias, rel_pos, rel_2d_pos):
        h = self.self(params["self"], hidden, attn_bias, rel_pos, rel_2d_pos)
        return self.output(params["output"], h, hidden)


class _SelfOutput(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.dense = Linear(config.hidden_size, config.hidden_size, **kw)
        self.LayerNorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)

    def __call__(self, params, hidden, residual):
        return self.LayerNorm(params["LayerNorm"],
                              self.dense(params["dense"], hidden) + residual)


class _Intermediate(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.dense = Linear(config.hidden_size, config.intermediate_size,
                            dtype=dtype, param_dtype=param_dtype)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, x):
        return self.act(self.dense(params["dense"], x))


class _Output(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.dense = Linear(config.intermediate_size, config.hidden_size, **kw)
        self.LayerNorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)

    def __call__(self, params, hidden, residual):
        return self.LayerNorm(params["LayerNorm"],
                              self.dense(params["dense"], hidden) + residual)


class LayoutLMv3Encoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.layer = [LayoutLMv3Layer(config, **kw)
                      for _ in range(config.num_hidden_layers)]
        if config.has_relative_attention_bias:
            self.rel_pos_bias = Linear(config.rel_pos_bins, config.num_attention_heads,
                                       use_bias=False, **kw)
        if config.has_spatial_attention_bias:
            self.rel_pos_x_bias = Linear(config.rel_2d_pos_bins,
                                         config.num_attention_heads, use_bias=False, **kw)
            self.rel_pos_y_bias = Linear(config.rel_2d_pos_bins,
                                         config.num_attention_heads, use_bias=False, **kw)

    def _1d_bias(self, params, position_ids):
        cfg = self.config
        rel = position_ids[:, None, :] - position_ids[:, :, None]
        buckets = relative_position_bucket(rel, cfg.rel_pos_bins, cfg.max_rel_pos)
        table = params["rel_pos_bias"]["weight"]  # stored [in=bins, out=heads]
        return jnp.transpose(jnp.take(table.astype(self.dtype), buckets, axis=0),
                             (0, 3, 1, 2))

    def _2d_bias(self, params, bbox):
        cfg = self.config
        out = 0.0
        for coord, name in ((bbox[:, :, 0], "rel_pos_x_bias"),
                            (bbox[:, :, 3], "rel_pos_y_bias")):
            rel = coord[:, None, :] - coord[:, :, None]
            buckets = relative_position_bucket(rel, cfg.rel_2d_pos_bins,
                                               cfg.max_rel_2d_pos)
            table = params[name]["weight"]
            out = out + jnp.transpose(
                jnp.take(table.astype(self.dtype), buckets, axis=0), (0, 3, 1, 2))
        return out

    def __call__(self, params, hidden, bbox=None, attention_mask=None,
                 position_ids=None):
        attn_bias = None
        if attention_mask is not None:
            attn_bias = (1.0 - attention_mask[:, None, None, :].astype(jnp.float32)) * NEG_INF
        rel_pos = self._1d_bias(params, position_ids) \
            if self.config.has_relative_attention_bias else None
        rel_2d_pos = self._2d_bias(params, bbox) \
            if self.config.has_spatial_attention_bias else None
        for i, layer in enumerate(self.layer):
            hidden = layer(params["layer"][str(i)], hidden, attn_bias,
                           rel_pos, rel_2d_pos)
        return hidden


class LayoutLMv3PreTrainedModel(PreTrainedModel):
    config_class = LayoutLMv3Config
    base_model_prefix = "layoutlmv3"


class _LayoutLMv3Core(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        if config.text_embed:
            self.embeddings = LayoutLMv3TextEmbeddings(config, **kw)
        if config.visual_embed:
            self.patch_embed = LayoutLMv3PatchEmbeddings(config, **kw)
            self.size = int(config.input_size / config.patch_size)
            self.LayerNorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
            self.norm = LayerNorm(config.hidden_size, 1e-6, **kw)
        self.encoder = LayoutLMv3Encoder(config, **kw)

    def init(self, rng):
        params = super().init(rng)
        if self.config.visual_embed:
            h = self.config.hidden_size
            params["cls_token"] = jnp.zeros((1, 1, h), self.param_dtype)
            params["pos_embed"] = jnp.zeros((1, self.size * self.size + 1, h),
                                            self.param_dtype)
        return params

    def _visual_bbox(self, max_len=1000):
        """Patch-grid boxes + cls box (reference create_visual_bbox :577)."""
        size = self.size
        x = np.arange(0, max_len * (size + 1), max_len) // size
        y = np.arange(0, max_len * (size + 1), max_len) // size
        grid = np.stack([np.tile(x[:-1], (size, 1)),
                         np.tile(y[:-1], (size, 1)).T,
                         np.tile(x[1:], (size, 1)),
                         np.tile(y[1:], (size, 1)).T], axis=-1).reshape(-1, 4)
        cls_box = np.array([[1, 1, max_len - 1, max_len - 1]])
        return jnp.asarray(np.concatenate([cls_box, grid], 0), jnp.int32)

    def forward_image(self, params, pixel_values):
        h = self.patch_embed(params["patch_embed"], pixel_values)
        b = h.shape[0]
        cls = jnp.broadcast_to(params["cls_token"].astype(self.dtype),
                               (b, 1, h.shape[-1]))
        h = jnp.concatenate([cls, h], axis=1)
        h = h + params["pos_embed"].astype(self.dtype)
        return self.norm(params["norm"], h)

    def __call__(self, params, input_ids=None, bbox=None, attention_mask=None,
                 token_type_ids=None, position_ids=None, pixel_values=None):
        cfg = self.config
        has_text = input_ids is not None
        if has_text:
            b, s = input_ids.shape
            if attention_mask is None:
                attention_mask = jnp.ones((b, s), jnp.int32)
            if bbox is None:
                bbox = jnp.zeros((b, s, 4), jnp.int32)
            h = self.embeddings(params["embeddings"], input_ids, bbox,
                                token_type_ids, position_ids)
        final_bbox = final_position_ids = None
        if pixel_values is not None:
            b = pixel_values.shape[0]
            vis = self.forward_image(params, pixel_values)
            vis_mask = jnp.ones((b, vis.shape[1]), jnp.int32)
            attention_mask = (jnp.concatenate([attention_mask, vis_mask], 1)
                              if has_text else vis_mask)
            if cfg.has_spatial_attention_bias:
                vbox = jnp.broadcast_to(self._visual_bbox()[None],
                                        (b,) + self._visual_bbox().shape)
                final_bbox = jnp.concatenate([bbox, vbox], 1) if has_text else vbox
            if cfg.has_relative_attention_bias or cfg.has_spatial_attention_bias:
                vis_pos = jnp.broadcast_to(jnp.arange(vis.shape[1]), (b, vis.shape[1]))
                if has_text:
                    text_pos = jnp.broadcast_to(jnp.arange(s), (b, s))
                    final_position_ids = jnp.concatenate([text_pos, vis_pos], 1)
                else:
                    final_position_ids = vis_pos
            h = jnp.concatenate([h, vis], 1) if has_text else vis
            h = self.LayerNorm(params["LayerNorm"], h)
        elif cfg.has_relative_attention_bias or cfg.has_spatial_attention_bias:
            final_bbox = bbox
            final_position_ids = jnp.broadcast_to(jnp.arange(s), (b, s))
        return self.encoder(params["encoder"], h, final_bbox, attention_mask,
                            final_position_ids)


class LayoutLMv3Model(LayoutLMv3PreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.layoutlmv3 = _LayoutLMv3Core(config, dtype=self.dtype,
                                          param_dtype=self.param_dtype)
    # hub checkpoints for the bare model have no prefix on the core
    _keys_to_ignore_on_load_unexpected = (r"^pooler\.",)

    def __call__(self, params, **kwargs):
        return BaseModelOutput(
            last_hidden_state=self.layoutlmv3(params["layoutlmv3"], **kwargs))


class LayoutLMv3ClassificationHead(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.dense = Linear(config.hidden_size, config.hidden_size, **kw)
        self.out_proj = Linear(config.hidden_size, config.num_labels, **kw)

    def __call__(self, params, x):
        return self.out_proj(params["out_proj"],
                             jnp.tanh(self.dense(params["dense"], x)))


class LayoutLMv3ForTokenClassification(LayoutLMv3PreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.layoutlmv3 = _LayoutLMv3Core(config, **kw)
        if config.num_labels < 10:
            self.classifier = Linear(config.hidden_size, config.num_labels, **kw)
        else:
            self.classifier = LayoutLMv3ClassificationHead(config, **kw)

    def __call__(self, params, input_ids=None, labels=None, **kwargs):
        h = self.layoutlmv3(params["layoutlmv3"], input_ids=input_ids, **kwargs)
        s = input_ids.shape[1]
        logits = self.classifier(params["classifier"], h[:, :s])
        loss = None
        if labels is not None:
            from ...loss import for_token_classification_loss

            loss = for_token_classification_loss(logits, labels, self.config)
        return TokenClassifierOutput(loss=loss, logits=logits)


class LayoutLMv3ForSequenceClassification(LayoutLMv3PreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.layoutlmv3 = _LayoutLMv3Core(config, **kw)
        self.classifier = LayoutLMv3ClassificationHead(config, **kw)

    def __call__(self, params, labels=None, **kwargs):
        h = self.layoutlmv3(params["layoutlmv3"], **kwargs)
        logits = self.classifier(params["classifier"], h[:, 0, :])
        loss = None
        if labels is not None:
            from ...loss import for_sequence_classification_loss

            loss = for_sequence_classification_loss(logits, labels, self.config)
        return SequenceClassifierOutput(loss=loss, logits=logits)


class LayoutLMv3ForQuestionAnswering(LayoutLMv3PreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.layoutlmv3 = _LayoutLMv3Core(config, **kw)
        self.qa_outputs = LayoutLMv3ClassificationHead(config, **kw)

    def __call__(self, params, start_positions=None, end_positions=None, **kwargs):
        h = self.layoutlmv3(params["layoutlmv3"], **kwargs)
        logits = self.qa_outputs(params["qa_outputs"], h)
        start_logits, end_logits = logits[..., 0], logits[..., 1]
        loss = None
        if start_positions is not None and end_positions is not None:
            from ...loss import for_question_answering_loss

            loss = for_question_answering_loss(start_logits, end_logits,
                                               start_positions, end_positions)
        return QuestionAnsweringModelOutput(loss=loss, start_logits=start_logits,
                                            end_logits=end_logits)
