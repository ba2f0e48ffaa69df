"""DeBERTa-v2/v3, TPU-native.

Semantics match reference src/transformers/models/deberta_v2/modeling_deberta_v2.py:
disentangled attention with content->position and position->content terms
(:137-346 — the c2p/p2c gathers use log-bucketed relative positions,
:57-100), shared or separate positional projections (``share_att_key``,
DeBERTa-v3 shares), optional LayerNorm on the relative embedding table,
optional depthwise conv branch on layer 0 (:449-485), factorized embeddings
(``embedding_size`` + ``embed_proj``), ContextPooler classification head.

Relative-position bucket tables are static numpy (seq len known at trace
time); every gather is a take_along_axis over MXU-friendly batched matmuls.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ...core.module import Conv, Embedding, LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import (
    BaseModelOutput,
    MaskedLMOutput,
    QuestionAnsweringModelOutput,
    SequenceClassifierOutput,
    TokenClassifierOutput,
)
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...ops.masks import to_additive
from .configuration_deberta_v2 import DebertaV2Config


def make_log_bucket_position(rel_pos: np.ndarray, bucket_size: int, max_position: int) -> np.ndarray:
    """reference make_log_bucket_position (:57-70), numpy."""
    sign = np.sign(rel_pos)
    mid = bucket_size // 2
    abs_pos = np.where((rel_pos < mid) & (rel_pos > -mid), mid - 1, np.abs(rel_pos))
    log_pos = np.ceil(np.log(abs_pos / mid) / np.log((max_position - 1) / mid) * (mid - 1)) + mid
    return np.where(abs_pos <= mid, rel_pos.astype(np.float64), log_pos * sign)


def build_relative_position(query_size: int, key_size: int, bucket_size=-1, max_position=-1) -> np.ndarray:
    """[1, Q, K] bucketed relative positions (reference :72-101)."""
    q_ids = np.arange(query_size)
    k_ids = np.arange(key_size)
    rel = q_ids[:, None] - k_ids[None, :]
    if bucket_size > 0 and max_position > 0:
        rel = make_log_bucket_position(rel, bucket_size, max_position)
    return rel.astype(np.int64)[None]


class DisentangledSelfAttention(Module):
    def __init__(self, config: DebertaV2Config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.num_heads = config.num_attention_heads
        self.head_dim = getattr(config, "attention_head_size",
                                config.hidden_size // config.num_attention_heads)
        all_head = self.num_heads * self.head_dim
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.query_proj = Linear(config.hidden_size, all_head, True, **kw)
        self.key_proj = Linear(config.hidden_size, all_head, True, **kw)
        self.value_proj = Linear(config.hidden_size, all_head, True, **kw)
        self.share_att_key = config.share_att_key
        self.pos_att_type = config.pos_att_type
        self.relative_attention = config.relative_attention
        if self.relative_attention:
            self.position_buckets = config.position_buckets
            self.max_relative_positions = config.max_relative_positions
            if self.max_relative_positions < 1:
                self.max_relative_positions = config.max_position_embeddings
            self.pos_ebd_size = (self.position_buckets if self.position_buckets > 0
                                 else self.max_relative_positions)
            if not self.share_att_key:
                if "c2p" in self.pos_att_type:
                    self.pos_key_proj = Linear(config.hidden_size, all_head, True, **kw)
                if "p2c" in self.pos_att_type:
                    self.pos_query_proj = Linear(config.hidden_size, all_head, False, **kw)

    def heads(self, x):
        b, s, _ = x.shape
        return x.reshape(b, s, self.num_heads, self.head_dim).transpose(0, 2, 1, 3)

    def __call__(self, params, hidden, mask_bias, relative_pos, rel_embeddings):
        b, s, _ = hidden.shape
        q = self.heads(self.query_proj(params["query_proj"], hidden))  # [B,H,S,D]
        k = self.heads(self.key_proj(params["key_proj"], hidden))
        v = self.heads(self.value_proj(params["value_proj"], hidden))

        scale_factor = 1 + ("c2p" in self.pos_att_type) + ("p2c" in self.pos_att_type)
        scale = float(np.sqrt(self.head_dim * scale_factor))
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k / scale,
                            preferred_element_type=jnp.float32)

        if self.relative_attention:
            scores = scores + self.disentangled_bias(params, q, k, relative_pos,
                                                     rel_embeddings, scale_factor)
        scores = scores + mask_bias
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        return out.transpose(0, 2, 1, 3).reshape(b, s, -1)

    def disentangled_bias(self, params, q, k, relative_pos, rel_embeddings, scale_factor):
        att_span = self.pos_ebd_size
        rel = rel_embeddings[: att_span * 2][None]  # [1, 2*span, E]
        if self.share_att_key:
            pos_q = self.heads(self.query_proj(params["query_proj"], rel))  # [1,H,2S,D]
            pos_k = self.heads(self.key_proj(params["key_proj"], rel))
        else:
            pos_k = (self.heads(self.pos_key_proj(params["pos_key_proj"], rel))
                     if "c2p" in self.pos_att_type else None)
            pos_q = (self.heads(self.pos_query_proj(params["pos_query_proj"], rel))
                     if "p2c" in self.pos_att_type else None)

        rel_idx = jnp.asarray(relative_pos)[None]  # [1, 1, Q, K]
        score = 0.0
        if "c2p" in self.pos_att_type:
            scale = float(np.sqrt(self.head_dim * scale_factor))
            c2p = jnp.einsum("bhqd,xhkd->bhqk", q.astype(jnp.float32),
                             pos_k.astype(jnp.float32))  # [B,H,Q,2span]
            c2p_pos = jnp.clip(rel_idx + att_span, 0, att_span * 2 - 1)
            idx = jnp.broadcast_to(c2p_pos, (q.shape[0], q.shape[1], *c2p_pos.shape[-2:]))
            c2p = jnp.take_along_axis(c2p, idx, axis=-1)
            score = score + c2p / scale
        if "p2c" in self.pos_att_type:
            scale = float(np.sqrt(self.head_dim * scale_factor))
            p2c = jnp.einsum("bhkd,xhrd->bhkr", k.astype(jnp.float32),
                             pos_q.astype(jnp.float32))  # [B,H,K,2span]
            p2c_pos = jnp.clip(-rel_idx + att_span, 0, att_span * 2 - 1)
            idx = jnp.broadcast_to(p2c_pos, (k.shape[0], k.shape[1], *p2c_pos.shape[-2:]))
            p2c = jnp.take_along_axis(p2c, idx, axis=-1)
            score = score + jnp.swapaxes(p2c, -1, -2) / scale
        return score


class DebertaV2Layer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        lkw = dict(**kw, kernel_init=normal_init(config.initializer_range))
        self.attention = _DebertaAttention(config, **kw)
        self.intermediate = _Dense(config.hidden_size, config.intermediate_size,
                                   config.hidden_act, **lkw)
        self.output = _OutDense(config.intermediate_size, config.hidden_size, config, **kw)

    def __call__(self, params, hidden, mask_bias, relative_pos, rel_embeddings):
        h = self.attention(params["attention"], hidden, mask_bias, relative_pos, rel_embeddings)
        inter = self.intermediate(params["intermediate"], h)
        return self.output(params["output"], inter, h)


class _DebertaAttention(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        setattr(self, "self", DisentangledSelfAttention(config, **kw))
        self.output = _OutDense(config.hidden_size, config.hidden_size, config, **kw)

    def __call__(self, params, hidden, mask_bias, relative_pos, rel_embeddings):
        h = getattr(self, "self")(params["self"], hidden, mask_bias, relative_pos, rel_embeddings)
        return self.output(params["output"], h, hidden)


class _Dense(Module):
    def __init__(self, in_dim, out_dim, act, *, dtype, param_dtype, kernel_init):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.dense = Linear(in_dim, out_dim, True, dtype=dtype, param_dtype=param_dtype,
                            kernel_init=kernel_init)
        self.act = get_activation(act)

    def __call__(self, params, x):
        return self.act(self.dense(params["dense"], x))


class _OutDense(Module):
    """dense + residual + LayerNorm (post-LN)."""

    def __init__(self, in_dim, out_dim, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.dense = Linear(in_dim, out_dim, True, dtype=dtype, param_dtype=param_dtype,
                            kernel_init=normal_init(config.initializer_range))
        self.LayerNorm = LayerNorm(out_dim, config.layer_norm_eps, dtype=dtype,
                                   param_dtype=param_dtype)

    def __call__(self, params, hidden, residual):
        return self.LayerNorm(params["LayerNorm"],
                              self.dense(params["dense"], hidden) + residual)


class DebertaV2ConvLayer(Module):
    """depthwise-ish conv branch fused into layer 0 (:449-485)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        k = config.conv_kernel_size
        self.conv = Conv(config.hidden_size, config.hidden_size, k, stride=1,
                         padding=(k - 1) // 2, use_bias=True, groups=config.conv_groups,
                         ndim=1, **kw)
        self.LayerNorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.act = get_activation(config.conv_act)

    def __call__(self, params, hidden, residual, input_mask):
        out = self.conv(params["conv"], jnp.swapaxes(hidden, 1, 2))
        out = jnp.swapaxes(out, 1, 2)
        mask = input_mask[..., None].astype(out.dtype)
        out = self.act(out * mask)
        out = self.LayerNorm(params["LayerNorm"], residual + out)
        return out * mask


class DebertaV2Embeddings(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        ekw = dict(**kw, embedding_init=normal_init(config.initializer_range))
        self.embedding_size = getattr(config, "embedding_size", config.hidden_size)
        self.word_embeddings = Embedding(config.vocab_size, self.embedding_size, **ekw)
        self.position_biased_input = config.position_biased_input
        if self.position_biased_input:
            self.position_embeddings = Embedding(config.max_position_embeddings,
                                                 self.embedding_size, **ekw)
        if config.type_vocab_size > 0:
            self.token_type_embeddings = Embedding(config.type_vocab_size,
                                                   self.embedding_size, **ekw)
        else:
            self.token_type_embeddings = None
        if self.embedding_size != config.hidden_size:
            self.embed_proj = Linear(self.embedding_size, config.hidden_size, False,
                                     kernel_init=normal_init(config.initializer_range), **kw)
        else:
            self.embed_proj = None
        self.LayerNorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)

    def __call__(self, params, input_ids, token_type_ids=None, mask=None):
        b, s = input_ids.shape
        h = self.word_embeddings(params["word_embeddings"], input_ids)
        if self.position_biased_input:
            pos = jnp.arange(s, dtype=jnp.int32)[None]
            h = h + self.position_embeddings(params["position_embeddings"], pos)
        if self.token_type_embeddings is not None:
            if token_type_ids is None:
                token_type_ids = jnp.zeros_like(input_ids)
            h = h + self.token_type_embeddings(params["token_type_embeddings"], token_type_ids)
        if self.embed_proj is not None:
            h = self.embed_proj(params["embed_proj"], h)
        h = self.LayerNorm(params["LayerNorm"], h)
        if mask is not None:
            h = h * mask[..., None].astype(h.dtype)
        return h


class DebertaV2Encoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.layer = [DebertaV2Layer(config, **kw) for _ in range(config.num_hidden_layers)]
        self.relative_attention = config.relative_attention
        if self.relative_attention:
            self.max_relative_positions = config.max_relative_positions
            if self.max_relative_positions < 1:
                self.max_relative_positions = config.max_position_embeddings
            self.position_buckets = config.position_buckets
            size = (self.position_buckets * 2 if self.position_buckets > 0
                    else self.max_relative_positions * 2)
            self.rel_embeddings = Embedding(size, config.hidden_size,
                                            embedding_init=normal_init(config.initializer_range), **kw)
        self.norm_rel_ebd = [x.strip() for x in config.norm_rel_ebd.lower().split("|")]
        if "layer_norm" in self.norm_rel_ebd:
            self.LayerNorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.conv = (DebertaV2ConvLayer(config, **kw)
                     if config.conv_kernel_size > 0 else None)

    def __call__(self, params, hidden, attention_mask):
        b, s, _ = hidden.shape
        input_mask = attention_mask if attention_mask is not None else jnp.ones((b, s), jnp.int32)
        pair = input_mask[:, None, :, None].astype(bool) & input_mask[:, None, None, :].astype(bool)
        mask_bias = to_additive(pair, jnp.float32)
        relative_pos = None
        rel_embeddings = None
        if self.relative_attention:
            relative_pos = build_relative_position(s, s, self.position_buckets,
                                                   self.max_relative_positions)
            rel = params["rel_embeddings"]["weight"].astype(jnp.float32)
            if "layer_norm" in self.norm_rel_ebd:
                rel = self.LayerNorm(params["LayerNorm"], rel)
            rel_embeddings = rel
        states = hidden
        for i, layer in enumerate(self.layer):
            out = layer(params["layer"][str(i)], states, mask_bias, relative_pos, rel_embeddings)
            if i == 0 and self.conv is not None:
                out = self.conv(params["conv"], hidden, out, input_mask)
            states = out
        return states


class DebertaV2Model(Module):
    def __init__(self, config: DebertaV2Config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.embeddings = DebertaV2Embeddings(config, **kw)
        self.encoder = DebertaV2Encoder(config, **kw)

    def __call__(self, params, input_ids=None, attention_mask=None, token_type_ids=None,
                 **kwargs) -> BaseModelOutput:
        b, s = input_ids.shape
        if attention_mask is None:
            attention_mask = jnp.ones((b, s), jnp.int32)
        h = self.embeddings(params["embeddings"], input_ids, token_type_ids, attention_mask)
        h = self.encoder(params["encoder"], h, attention_mask)
        return BaseModelOutput(last_hidden_state=h)


class DebertaV2PreTrainedModel(PreTrainedModel):
    config_class = DebertaV2Config
    base_model_prefix = "deberta"
    _keys_to_ignore_on_load_unexpected = (r"position_ids",)


class DebertaV2ModelStandalone(DebertaV2PreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.deberta = DebertaV2Model(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.deberta(params["deberta"], *args, **kwargs)


class ContextPooler(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.dense = Linear(config.pooler_hidden_size, config.pooler_hidden_size, True,
                            dtype=dtype, param_dtype=param_dtype,
                            kernel_init=normal_init(config.initializer_range))
        self.act = get_activation(config.pooler_hidden_act)

    def __call__(self, params, hidden):
        return self.act(self.dense(params["dense"], hidden[:, 0]))


class DebertaV2ForSequenceClassification(DebertaV2PreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.num_labels = config.num_labels
        self.deberta = DebertaV2Model(config, **kw)
        self.pooler = ContextPooler(config, **kw)
        self.classifier = Linear(config.pooler_hidden_size, config.num_labels, True,
                                 kernel_init=normal_init(config.initializer_range), **kw)

    def __call__(self, params, input_ids=None, attention_mask=None, token_type_ids=None,
                 labels=None, **kwargs) -> SequenceClassifierOutput:
        out = self.deberta(params["deberta"], input_ids, attention_mask, token_type_ids)
        pooled = self.pooler(params["pooler"], out.last_hidden_state)
        logits = self.classifier(params["classifier"], pooled)
        loss = None
        if labels is not None:
            from ...loss import for_sequence_classification_loss

            loss = for_sequence_classification_loss(logits, labels, self.config)
        return SequenceClassifierOutput(loss=loss, logits=logits)


class DebertaV2ForTokenClassification(DebertaV2PreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.deberta = DebertaV2Model(config, **kw)
        self.classifier = Linear(config.hidden_size, config.num_labels, True,
                                 kernel_init=normal_init(config.initializer_range), **kw)

    def __call__(self, params, input_ids=None, attention_mask=None, token_type_ids=None,
                 labels=None, **kwargs) -> TokenClassifierOutput:
        out = self.deberta(params["deberta"], input_ids, attention_mask, token_type_ids)
        logits = self.classifier(params["classifier"], out.last_hidden_state)
        loss = None
        if labels is not None:
            from ...loss import for_token_classification_loss

            loss = for_token_classification_loss(logits, labels, self.config)
        return TokenClassifierOutput(loss=loss, logits=logits)


class DebertaV2ForQuestionAnswering(DebertaV2PreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.deberta = DebertaV2Model(config, **kw)
        self.qa_outputs = Linear(config.hidden_size, 2, True,
                                 kernel_init=normal_init(config.initializer_range), **kw)

    def __call__(self, params, input_ids=None, attention_mask=None, token_type_ids=None,
                 start_positions=None, end_positions=None, **kwargs) -> QuestionAnsweringModelOutput:
        out = self.deberta(params["deberta"], input_ids, attention_mask, token_type_ids)
        logits = self.qa_outputs(params["qa_outputs"], out.last_hidden_state)
        start_logits, end_logits = logits[..., 0], logits[..., 1]
        loss = None
        if start_positions is not None and end_positions is not None:
            from ...loss import for_question_answering_loss

            loss = for_question_answering_loss(start_logits, end_logits,
                                               start_positions, end_positions)
        return QuestionAnsweringModelOutput(loss=loss, start_logits=start_logits,
                                            end_logits=end_logits)


class DebertaV2ForMaskedLM(DebertaV2PreTrainedModel):
    """Legacy MLM head (cls.predictions.*, reference :803-848)."""

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.deberta = DebertaV2Model(config, **kw)
        self.cls = _LegacyMLMHead(config, **kw)

    def get_input_embedding_path(self):
        return "deberta.embeddings.word_embeddings.weight"

    def __call__(self, params, input_ids=None, attention_mask=None, token_type_ids=None,
                 labels=None, **kwargs) -> MaskedLMOutput:
        out = self.deberta(params["deberta"], input_ids, attention_mask, token_type_ids)
        table = params["deberta"]["embeddings"]["word_embeddings"]["weight"]
        logits = self.cls(params["cls"], out.last_hidden_state, table)
        loss = None
        if labels is not None:
            from ...loss import for_masked_lm_loss

            loss = for_masked_lm_loss(logits, labels, self.config.vocab_size)
        return MaskedLMOutput(loss=loss, logits=logits)


class _LegacyMLMHead(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.predictions = _LegacyPredictionHead(config, dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, hidden, table):
        return self.predictions(params["predictions"], hidden, table)


class _LegacyPredictionHead(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.vocab_size = config.vocab_size
        self.transform = _LegacyTransform(config, dtype=dtype, param_dtype=param_dtype)

    def init(self, rng):
        params = super().init(rng)
        params["bias"] = jnp.zeros((self.vocab_size,), self.param_dtype)
        return params

    def __call__(self, params, hidden, table):
        h = self.transform(params["transform"], hidden)
        return h @ table.astype(h.dtype).T + params["bias"].astype(h.dtype)


class _LegacyTransform(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        size = getattr(config, "embedding_size", config.hidden_size)
        self.dense = Linear(config.hidden_size, size, True, dtype=dtype,
                            param_dtype=param_dtype,
                            kernel_init=normal_init(config.initializer_range))
        self.LayerNorm = LayerNorm(size, config.layer_norm_eps, dtype=dtype,
                                   param_dtype=param_dtype)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, x):
        return self.LayerNorm(params["LayerNorm"], self.act(self.dense(params["dense"], x)))
