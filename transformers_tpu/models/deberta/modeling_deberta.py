"""DeBERTa v1 (reference models/deberta/modeling_deberta.py).

Disentangled attention with the *v1* layout: one packed ``in_proj``
[3*H, hidden] whose output dim is head-major q|k|v interleaved per head
(:242-252), free-standing ``q_bias``/``v_bias`` vectors, un-bucketed
relative positions clamped to ``max_relative_positions`` (:72-98), a
``pos_proj`` (no bias) for c2p and ``pos_q_proj`` for p2c (:191-194), and
mask-scaled embeddings (:415-421). The MLM checkpoint uses the legacy
``cls.predictions`` head with a tied decoder (:746-771).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ...core.module import Embedding, LayerNorm, Linear, Module, normal_init
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
from .configuration_deberta import DebertaConfig


def build_relative_position(query_size: int, key_size: int) -> np.ndarray:
    """[1, Q, K] raw relative positions (reference :72-98, no bucketing)."""
    q_ids = np.arange(query_size)
    k_ids = np.arange(key_size)
    return (q_ids[:, None] - k_ids[None, :]).astype(np.int64)[None]


class DisentangledSelfAttention(Module):
    def __init__(self, config: DebertaConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.num_heads = config.num_attention_heads
        self.head_dim = config.hidden_size // config.num_attention_heads
        all_head = self.num_heads * self.head_dim
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.in_proj = Linear(config.hidden_size, all_head * 3, False, **kw)
        self.pos_att_type = config.pos_att_type
        self.relative_attention = config.relative_attention
        if self.relative_attention:
            self.max_relative_positions = config.max_relative_positions
            if self.max_relative_positions < 1:
                self.max_relative_positions = config.max_position_embeddings
            if "c2p" in self.pos_att_type:
                self.pos_proj = Linear(config.hidden_size, all_head, False, **kw)
            if "p2c" in self.pos_att_type:
                self.pos_q_proj = Linear(config.hidden_size, all_head, True, **kw)

    def init(self, rng):
        params = super().init(rng)
        all_head = self.num_heads * self.head_dim
        params["q_bias"] = jnp.zeros((all_head,), self.param_dtype)
        params["v_bias"] = jnp.zeros((all_head,), self.param_dtype)
        return params

    def heads(self, x):
        # [..., S, H*D] -> [..., H, S, D]
        s = x.shape[-2]
        lead = x.shape[:-2]
        x = x.reshape(*lead, s, self.num_heads, -1)
        return jnp.moveaxis(x, -2, -3)

    def __call__(self, params, hidden, mask_bias, relative_pos, rel_embeddings):
        b, s, _ = hidden.shape
        # packed projection: output dim is head-major with q|k|v per head
        qp = self.in_proj(params["in_proj"], hidden)  # [B,S,3*H*D]
        qkv = self.heads(qp)  # [B,H,S,3*D]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q + params["q_bias"].astype(q.dtype).reshape(self.num_heads, 1, -1)
        v = v + params["v_bias"].astype(v.dtype).reshape(self.num_heads, 1, -1)

        scale_factor = 1 + len(self.pos_att_type)
        scale = float(np.sqrt(self.head_dim * scale_factor))
        q = q / scale
        scores = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                            k.astype(jnp.float32))
        if self.relative_attention and rel_embeddings is not None:
            scores = scores + self.disentangled_bias(params, q, k, relative_pos,
                                                     rel_embeddings, scale_factor)
        scores = scores + mask_bias
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        return out.transpose(0, 2, 1, 3).reshape(b, s, -1)

    def disentangled_bias(self, params, q, k, relative_pos, rel_embeddings, scale_factor):
        s = q.shape[-2]
        att_span = min(s, self.max_relative_positions)
        rel = rel_embeddings[self.max_relative_positions - att_span:
                             self.max_relative_positions + att_span][None]
        rel_idx = jnp.asarray(relative_pos)[None]  # [1, 1, Q, K]
        score = 0.0
        if "c2p" in self.pos_att_type:
            pos_k = self.heads(self.pos_proj(params["pos_proj"], rel))  # [1,H,2span,D]
            # q is already scaled (reference :259-261, c2p reuses the scaled q)
            c2p = jnp.einsum("bhqd,xhkd->bhqk", q.astype(jnp.float32),
                             pos_k.astype(jnp.float32))
            c2p_pos = jnp.clip(rel_idx + att_span, 0, att_span * 2 - 1)
            idx = jnp.broadcast_to(c2p_pos, (q.shape[0], q.shape[1], *c2p_pos.shape[-2:]))
            score = score + jnp.take_along_axis(c2p, idx, axis=-1)
        if "p2c" in self.pos_att_type:
            pos_q = self.heads(self.pos_q_proj(params["pos_q_proj"], rel))
            pos_q = pos_q / float(np.sqrt(self.head_dim * scale_factor))
            p2c = jnp.einsum("bhkd,xhrd->bhkr", k.astype(jnp.float32),
                             pos_q.astype(jnp.float32))
            p2c_pos = jnp.clip(-rel_idx + att_span, 0, att_span * 2 - 1)
            idx = jnp.broadcast_to(p2c_pos, (k.shape[0], k.shape[1], *p2c_pos.shape[-2:]))
            p2c = jnp.take_along_axis(p2c, idx, axis=-1)
            score = score + jnp.swapaxes(p2c, -1, -2)
        return score


class _OutDense(Module):
    def __init__(self, in_dim, out_dim, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.dense = Linear(in_dim, out_dim, True, dtype=dtype, param_dtype=param_dtype,
                            kernel_init=normal_init(config.initializer_range))
        self.LayerNorm = LayerNorm(out_dim, config.layer_norm_eps, dtype=dtype,
                                   param_dtype=param_dtype)

    def __call__(self, params, hidden, residual):
        return self.LayerNorm(params["LayerNorm"],
                              self.dense(params["dense"], hidden) + residual)


class _DebertaAttention(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        setattr(self, "self", DisentangledSelfAttention(config, **kw))
        self.output = _OutDense(config.hidden_size, config.hidden_size, config, **kw)

    def __call__(self, params, hidden, mask_bias, relative_pos, rel_embeddings):
        h = getattr(self, "self")(params["self"], hidden, mask_bias, relative_pos,
                                  rel_embeddings)
        return self.output(params["output"], h, hidden)


class DebertaLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.attention = _DebertaAttention(config, **kw)
        inter = Module(**kw)
        inter.dense = Linear(config.hidden_size, config.intermediate_size, True,
                             kernel_init=normal_init(config.initializer_range), **kw)
        self.intermediate = inter
        self.output = _OutDense(config.intermediate_size, config.hidden_size, config, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, hidden, mask_bias, relative_pos, rel_embeddings):
        h = self.attention(params["attention"], hidden, mask_bias, relative_pos,
                           rel_embeddings)
        inner = self.act(self.intermediate.dense(params["intermediate"]["dense"], h))
        return self.output(params["output"], inner, h)


class DebertaEmbeddings(Module):
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


class DebertaEncoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.layer = [DebertaLayer(config, **kw) for _ in range(config.num_hidden_layers)]
        self.relative_attention = config.relative_attention
        if self.relative_attention:
            self.max_relative_positions = config.max_relative_positions
            if self.max_relative_positions < 1:
                self.max_relative_positions = config.max_position_embeddings
            self.rel_embeddings = Embedding(
                self.max_relative_positions * 2, config.hidden_size,
                embedding_init=normal_init(config.initializer_range), **kw)

    def __call__(self, params, hidden, attention_mask, output_hidden_states=False):
        b, s, _ = hidden.shape
        input_mask = attention_mask if attention_mask is not None else jnp.ones((b, s), jnp.int32)
        pair = input_mask[:, None, :, None].astype(bool) & input_mask[:, None, None, :].astype(bool)
        mask_bias = to_additive(pair, jnp.float32)
        relative_pos = None
        rel_embeddings = None
        if self.relative_attention:
            relative_pos = build_relative_position(s, s)
            rel_embeddings = params["rel_embeddings"]["weight"].astype(jnp.float32)
        states = hidden
        all_hidden = [] if output_hidden_states else None
        for i, layer in enumerate(self.layer):
            if output_hidden_states:
                all_hidden.append(states)
            states = layer(params["layer"][str(i)], states, mask_bias, relative_pos,
                           rel_embeddings)
        if output_hidden_states:
            all_hidden.append(states)
        return states, all_hidden


class DebertaModel(Module):
    def __init__(self, config: DebertaConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.embeddings = DebertaEmbeddings(config, **kw)
        self.encoder = DebertaEncoder(config, **kw)

    def __call__(self, params, input_ids=None, attention_mask=None, token_type_ids=None,
                 output_hidden_states=False, **kwargs) -> BaseModelOutput:
        b, s = input_ids.shape
        if attention_mask is None:
            attention_mask = jnp.ones((b, s), jnp.int32)
        h = self.embeddings(params["embeddings"], input_ids, token_type_ids, attention_mask)
        h, all_hidden = self.encoder(params["encoder"], h, attention_mask,
                                     output_hidden_states)
        return BaseModelOutput(
            last_hidden_state=h,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None)


class DebertaPreTrainedModel(PreTrainedModel):
    config_class = DebertaConfig
    base_model_prefix = "deberta"
    _keys_to_ignore_on_load_unexpected = (r"position_ids", r"position_embeddings")


class DebertaModelStandalone(DebertaPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.deberta = DebertaModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.deberta(params["deberta"], *args, **kwargs)


class _LegacyPredictionHead(Module):
    """cls.predictions: transform + tied decoder + bias (reference :727-771)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        embedding_size = getattr(config, "embedding_size", config.hidden_size)
        transform = Module(**kw)
        transform.dense = Linear(config.hidden_size, embedding_size, True,
                                 kernel_init=normal_init(config.initializer_range), **kw)
        transform.LayerNorm = LayerNorm(embedding_size, config.layer_norm_eps, **kw)
        self.transform = transform
        self.act = get_activation(config.hidden_act)
        self.vocab_size = config.vocab_size

    def init(self, rng):
        params = super().init(rng)
        params["bias"] = jnp.zeros((self.vocab_size,), self.param_dtype)
        return params

    def __call__(self, params, hidden, table):
        h = self.act(self.transform.dense(params["transform"]["dense"], hidden))
        h = self.transform.LayerNorm(params["transform"]["LayerNorm"], h)
        return jnp.dot(h.astype(self.dtype), table.astype(self.dtype).T) + params["bias"].astype(self.dtype)


class DebertaForMaskedLM(DebertaPreTrainedModel):
    _keys_to_ignore_on_load_unexpected = (
        r"position_ids", r"position_embeddings", r"cls\.predictions\.decoder\.")

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.deberta = DebertaModel(config, **kw)
        cls = Module(**kw)
        cls.predictions = _LegacyPredictionHead(config, **kw)
        self.cls = cls

    def get_input_embedding_path(self):
        return "deberta.embeddings.word_embeddings.weight"

    def __call__(self, params, input_ids=None, attention_mask=None, token_type_ids=None,
                 labels=None, output_hidden_states=False, **kwargs) -> MaskedLMOutput:
        out = self.deberta(params["deberta"], input_ids, attention_mask, token_type_ids,
                           output_hidden_states)
        table = params["deberta"]["embeddings"]["word_embeddings"]["weight"]
        logits = self.cls.predictions(params["cls"]["predictions"],
                                      out.last_hidden_state, table)
        loss = None
        if labels is not None:
            from ...loss import for_masked_lm_loss

            loss = for_masked_lm_loss(logits, labels, self.config.vocab_size)
        return MaskedLMOutput(loss=loss, logits=logits, hidden_states=out.hidden_states)


class ContextPooler(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.dense = Linear(config.pooler_hidden_size, config.pooler_hidden_size, True,
                            dtype=dtype, param_dtype=param_dtype,
                            kernel_init=normal_init(config.initializer_range))
        self.act = get_activation(config.pooler_hidden_act)

    def __call__(self, params, hidden):
        return self.act(self.dense(params["dense"], hidden[:, 0]))


class DebertaForSequenceClassification(DebertaPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.num_labels = config.num_labels
        self.deberta = DebertaModel(config, **kw)
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


class DebertaForTokenClassification(DebertaPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.deberta = DebertaModel(config, **kw)
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


class DebertaForQuestionAnswering(DebertaPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.deberta = DebertaModel(config, **kw)
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
