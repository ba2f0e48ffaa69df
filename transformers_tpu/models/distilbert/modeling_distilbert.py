"""DistilBERT encoder, TPU-native.

Semantics match reference src/transformers/models/distilbert/modeling_distilbert.py:
embeddings without token types (:82), post-LN blocks
``sa_layer_norm(attn + x)`` then ``output_layer_norm(ffn + h)`` (:227-257),
q/k/v/out ``*_lin`` names (:150), MLM head transform→act→LN→tied projector
(:510-513), CLS + pre_classifier(ReLU) sequence head (:593-597).
Checkpoint layout: ``distilbert.{embeddings,transformer.layer.N}``.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ...core.module import Embedding, LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import (
    BaseModelOutputWithPooling,
    MaskedLMOutput,
    QuestionAnsweringModelOutput,
    SequenceClassifierOutput,
)
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...ops.attention import get_attention_fn
from .configuration_distilbert import DistilBertConfig


class DistilBertEmbeddings(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  embedding_init=normal_init(config.initializer_range))
        self.word_embeddings = Embedding(config.vocab_size, config.dim, **kw)
        self.position_embeddings = Embedding(config.max_position_embeddings, config.dim, **kw)
        self.LayerNorm = LayerNorm(config.dim, 1e-12, dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, input_ids, position_ids=None, inputs_embeds=None):
        if inputs_embeds is None:
            inputs_embeds = self.word_embeddings(params["word_embeddings"], input_ids)
        s = inputs_embeds.shape[1]
        if position_ids is None:
            position_ids = jnp.arange(s, dtype=jnp.int32)[None, :]
        pos = self.position_embeddings(params["position_embeddings"], position_ids)
        return self.LayerNorm(params["LayerNorm"], inputs_embeds + pos)


class DistilBertSelfAttention(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.n_heads = config.n_heads
        self.head_dim = config.dim // config.n_heads
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(config.initializer_range))
        self.q_lin = Linear(config.dim, config.dim, True, **kw)
        self.k_lin = Linear(config.dim, config.dim, True, **kw)
        self.v_lin = Linear(config.dim, config.dim, True, **kw)
        self.out_lin = Linear(config.dim, config.dim, True, **kw)

    def __call__(self, params, hidden, attn_args):
        b, s, e = hidden.shape
        q = self.q_lin(params["q_lin"], hidden).reshape(b, s, self.n_heads, self.head_dim)
        k = self.k_lin(params["k_lin"], hidden).reshape(b, s, self.n_heads, self.head_dim)
        v = self.v_lin(params["v_lin"], hidden).reshape(b, s, self.n_heads, self.head_dim)
        attn_fn = get_attention_fn(self.config.attn_implementation)
        out = attn_fn(q, k, v, scale=self.head_dim**-0.5, **attn_args)
        return self.out_lin(params["out_lin"], out.reshape(b, s, e))


class DistilBertFFN(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(config.initializer_range))
        self.lin1 = Linear(config.dim, config.hidden_dim, True, **kw)
        self.lin2 = Linear(config.hidden_dim, config.dim, True, **kw)
        self.act = get_activation(config.activation)

    def __call__(self, params, x):
        return self.lin2(params["lin2"], self.act(self.lin1(params["lin1"], x)))


class DistilBertBlock(Module):
    """Post-LN block (reference TransformerBlock :227)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.attention = DistilBertSelfAttention(config, **kw)
        self.sa_layer_norm = LayerNorm(config.dim, 1e-12, **kw)
        self.ffn = DistilBertFFN(config, **kw)
        self.output_layer_norm = LayerNorm(config.dim, 1e-12, **kw)

    def __call__(self, params, hidden, attn_args):
        attn = self.attention(params["attention"], hidden, attn_args)
        hidden = self.sa_layer_norm(params["sa_layer_norm"], attn + hidden)
        ffn = self.ffn(params["ffn"], hidden)
        return self.output_layer_norm(params["output_layer_norm"], ffn + hidden)


class DistilBertTransformer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.layer = [DistilBertBlock(config, dtype=dtype, param_dtype=param_dtype)
                      for _ in range(config.n_layers)]

    def __call__(self, params, hidden, attn_args, output_hidden_states=False):
        all_hidden = [] if output_hidden_states else None
        for i, block in enumerate(self.layer):
            if output_hidden_states:
                all_hidden.append(hidden)
            hidden = block(params["layer"][str(i)], hidden, attn_args)
        if output_hidden_states:
            all_hidden.append(hidden)
        return hidden, all_hidden


class DistilBertModel(Module):
    def __init__(self, config: DistilBertConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embeddings = DistilBertEmbeddings(config, **kw)
        self.transformer = DistilBertTransformer(config, **kw)

    def __call__(self, params, input_ids=None, attention_mask=None, position_ids=None,
                 inputs_embeds=None, output_hidden_states=False) -> BaseModelOutputWithPooling:
        hidden = self.embeddings(params["embeddings"], input_ids, position_ids, inputs_embeds)
        b, s, _ = hidden.shape
        kv_valid = attention_mask if attention_mask is not None else jnp.ones((b, s), jnp.int32)
        attn_args = {"kv_valid": kv_valid, "is_causal": False}
        hidden, all_hidden = self.transformer(params["transformer"], hidden, attn_args,
                                              output_hidden_states)
        return BaseModelOutputWithPooling(
            last_hidden_state=hidden, pooler_output=None,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None,
        )


class DistilBertPreTrainedModel(PreTrainedModel):
    config_class = DistilBertConfig
    base_model_prefix = "distilbert"


class DistilBertModelStandalone(DistilBertPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.distilbert = DistilBertModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.distilbert(params["distilbert"], *args, **kwargs)


class DistilBertForMaskedLM(DistilBertPreTrainedModel):
    """vocab_transform -> act -> vocab_layer_norm -> tied vocab_projector
    (reference :510-513)."""

    _tied_weights_keys = ("vocab_projector.weight",)
    _keys_to_ignore_on_load_unexpected = (r"vocab_projector\.weight", r"\.position_ids$")

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        lkw = dict(**kw, kernel_init=normal_init(config.initializer_range))
        self.distilbert = DistilBertModel(config, **kw)
        self.vocab_transform = Linear(config.dim, config.dim, True, **lkw)
        self.vocab_layer_norm = LayerNorm(config.dim, 1e-12, **kw)
        self.act = get_activation(config.activation)
        self.vocab_size = config.vocab_size

    def init(self, rng):
        params = super().init(rng)
        # tied projector: weight shared with word embeddings; own bias
        params["vocab_projector"] = {"bias": jnp.zeros((self.vocab_size,), self.param_dtype)}
        return params

    def get_input_embedding_path(self):
        return "distilbert.embeddings.word_embeddings.weight"

    @property
    def tied_weights_keys(self):
        return ()  # tied via attend() below, never materialized

    def __call__(self, params, input_ids=None, attention_mask=None, labels=None, **kwargs) -> MaskedLMOutput:
        out = self.distilbert(params["distilbert"], input_ids, attention_mask, **kwargs)
        h = self.vocab_transform(params["vocab_transform"], out.last_hidden_state)
        h = self.vocab_layer_norm(params["vocab_layer_norm"], self.act(h))
        logits = self.distilbert.embeddings.word_embeddings.attend(
            params["distilbert"]["embeddings"]["word_embeddings"], h)
        logits = logits + params["vocab_projector"]["bias"].astype(logits.dtype)
        loss = None
        if labels is not None:
            from ...loss import for_masked_lm_loss

            loss = for_masked_lm_loss(logits, labels, self.vocab_size)
        return MaskedLMOutput(loss=loss, logits=logits, hidden_states=out.hidden_states)


class DistilBertForSequenceClassification(DistilBertPreTrainedModel):
    """CLS token -> pre_classifier -> ReLU -> classifier (reference :593)."""

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.distilbert = DistilBertModel(config, dtype=self.dtype, param_dtype=self.param_dtype)
        self.pre_classifier = Linear(config.dim, config.dim, True, **kw)
        self.classifier = Linear(config.dim, config.num_labels, True, **kw)
        self.num_labels = config.num_labels

    def __call__(self, params, input_ids=None, attention_mask=None, labels=None, **kwargs):
        out = self.distilbert(params["distilbert"], input_ids, attention_mask, **kwargs)
        pooled = out.last_hidden_state[:, 0]
        pooled = jnp.maximum(self.pre_classifier(params["pre_classifier"], pooled), 0.0)
        logits = self.classifier(params["classifier"], pooled)
        loss = None
        if labels is not None:
            from ...loss import for_sequence_classification_loss

            loss = for_sequence_classification_loss(logits, labels, self.config)
        return SequenceClassifierOutput(loss=loss, logits=logits, hidden_states=out.hidden_states)


class DistilBertForQuestionAnswering(DistilBertPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.distilbert = DistilBertModel(config, dtype=self.dtype, param_dtype=self.param_dtype)
        self.qa_outputs = Linear(config.dim, 2, True, dtype=self.dtype, param_dtype=self.param_dtype,
                                 kernel_init=normal_init(config.initializer_range))

    def __call__(self, params, input_ids=None, attention_mask=None,
                 start_positions=None, end_positions=None, **kwargs):
        out = self.distilbert(params["distilbert"], input_ids, attention_mask, **kwargs)
        logits = self.qa_outputs(params["qa_outputs"], out.last_hidden_state)
        start_logits = logits[..., 0]
        end_logits = logits[..., 1]
        loss = None
        if start_positions is not None and end_positions is not None:
            from ...loss import for_question_answering_loss

            loss = for_question_answering_loss(start_logits, end_logits,
                                               start_positions, end_positions)
        return QuestionAnsweringModelOutput(
            loss=loss, start_logits=start_logits, end_logits=end_logits,
            hidden_states=out.hidden_states)
