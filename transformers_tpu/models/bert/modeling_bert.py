"""BERT, TPU-native (reference src/transformers/models/bert/modeling_bert.py).

The bidirectional post-LN encoder skeleton: absolute position + token-type
embeddings with LayerNorm; per-layer attention.self.{query,key,value} +
attention.output.{dense,LayerNorm}; intermediate/output MLP; pooler; and the
MLM / sequence- / token-classification / QA heads with reference checkpoint
names (``cls.predictions.transform...``). RoBERTa subclasses this skeleton.
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
    TokenClassifierOutput,
)
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...ops.attention import get_attention_fn
from .configuration_bert import BertConfig


class BertEmbeddings(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype, embedding_init=normal_init(config.initializer_range))
        self.word_embeddings = Embedding(config.vocab_size, config.hidden_size, **kw)
        self.position_embeddings = Embedding(config.max_position_embeddings, config.hidden_size, **kw)
        self.token_type_embeddings = Embedding(config.type_vocab_size, config.hidden_size, **kw)
        self.LayerNorm = LayerNorm(config.hidden_size, config.layer_norm_eps, dtype=dtype, param_dtype=param_dtype)
        self.pad_token_id = config.pad_token_id

    def position_ids(self, input_ids):
        s = input_ids.shape[1]
        return jnp.arange(s, dtype=jnp.int32)[None, :]

    def __call__(self, params, input_ids, token_type_ids=None, position_ids=None, inputs_embeds=None):
        if inputs_embeds is None:
            inputs_embeds = self.word_embeddings(params["word_embeddings"], input_ids)
        if position_ids is None:
            position_ids = self.position_ids(input_ids)
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        h = (
            inputs_embeds
            + self.position_embeddings(params["position_embeddings"], position_ids)
            + self.token_type_embeddings(params["token_type_embeddings"], token_type_ids)
        )
        return self.LayerNorm(params["LayerNorm"], h)


class BertSelfAttention(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.num_heads = config.num_attention_heads
        self.head_dim = config.hidden_size // config.num_attention_heads
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(config.initializer_range))
        self.query = Linear(config.hidden_size, config.hidden_size, True, **kw)
        self.key = Linear(config.hidden_size, config.hidden_size, True, **kw)
        self.value = Linear(config.hidden_size, config.hidden_size, True, **kw)

    def __call__(self, params, hidden, attn_args):
        b, s, e = hidden.shape
        q = self.query(params["query"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        k = self.key(params["key"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        v = self.value(params["value"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        attn_fn = get_attention_fn(self.config.attn_implementation)
        out = attn_fn(q, k, v, scale=self.head_dim**-0.5, **attn_args)
        return out.reshape(b, s, e)


class BertSelfOutput(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(config.initializer_range))
        self.dense = Linear(config.hidden_size, config.hidden_size, True, **kw)
        self.LayerNorm = LayerNorm(config.hidden_size, config.layer_norm_eps, dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, hidden, residual):
        return self.LayerNorm(params["LayerNorm"], self.dense(params["dense"], hidden) + residual)


class BertAttention(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.self = BertSelfAttention(config, dtype=dtype, param_dtype=param_dtype)
        self.output = BertSelfOutput(config, dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, hidden, attn_args):
        out = self.self(params["self"], hidden, attn_args)
        return self.output(params["output"], out, hidden)


class BertIntermediate(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.dense = Linear(config.hidden_size, config.intermediate_size, True, dtype=dtype,
                            param_dtype=param_dtype, kernel_init=normal_init(config.initializer_range))
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, x):
        return self.act(self.dense(params["dense"], x))


class BertOutput(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.dense = Linear(config.intermediate_size, config.hidden_size, True, dtype=dtype,
                            param_dtype=param_dtype, kernel_init=normal_init(config.initializer_range))
        self.LayerNorm = LayerNorm(config.hidden_size, config.layer_norm_eps, dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, hidden, residual):
        return self.LayerNorm(params["LayerNorm"], self.dense(params["dense"], hidden) + residual)


class BertLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.attention = BertAttention(config, **kw)
        self.intermediate = BertIntermediate(config, **kw)
        self.output = BertOutput(config, **kw)

    def __call__(self, params, hidden, attn_args):
        hidden = self.attention(params["attention"], hidden, attn_args)
        inner = self.intermediate(params["intermediate"], hidden)
        return self.output(params["output"], inner, hidden)


class BertEncoder(Module):
    layer_cls = BertLayer

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.layer = [self.layer_cls(config, dtype=dtype, param_dtype=param_dtype)
                      for _ in range(config.num_hidden_layers)]

    def __call__(self, params, hidden, attn_args, output_hidden_states=False):
        all_hidden = [] if output_hidden_states else None
        for i, layer in enumerate(self.layer):
            if output_hidden_states:
                all_hidden.append(hidden)
            hidden = layer(params["layer"][str(i)], hidden, attn_args)
        if output_hidden_states:
            all_hidden.append(hidden)
        return hidden, all_hidden


class BertPooler(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.dense = Linear(config.hidden_size, config.hidden_size, True, dtype=dtype,
                            param_dtype=param_dtype, kernel_init=normal_init(config.initializer_range))

    def __call__(self, params, hidden):
        return jnp.tanh(self.dense(params["dense"], hidden[:, 0]))


class BertModel(Module):
    embeddings_cls = BertEmbeddings
    encoder_cls = BertEncoder

    def __init__(self, config: BertConfig, *, dtype, param_dtype, add_pooling_layer=True):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embeddings = self.embeddings_cls(config, **kw)
        self.encoder = self.encoder_cls(config, **kw)
        if add_pooling_layer:
            self.pooler = BertPooler(config, **kw)
        else:
            self.pooler = None

    def __call__(self, params, input_ids=None, attention_mask=None, token_type_ids=None,
                 position_ids=None, inputs_embeds=None, output_hidden_states=False,
                 output_attentions=False, attention_bias=None) -> BaseModelOutputWithPooling:
        hidden = self.embeddings(params["embeddings"], input_ids, token_type_ids, position_ids, inputs_embeds)
        b, s, _ = hidden.shape
        kv_valid = attention_mask if attention_mask is not None else jnp.ones((b, s), jnp.int32)
        attn_args = {"kv_valid": kv_valid, "is_causal": False}
        if attention_bias is not None:
            # full [B, 1, S, S] additive mask (Grounding-DINO's per-phrase
            # block attention over the caption)
            attn_args = {"bias": attention_bias, "is_causal": False}
        probs_sink = [] if output_attentions else None
        if output_attentions:
            attn_args["probs_sink"] = probs_sink
        hidden, all_hidden = self.encoder(params["encoder"], hidden, attn_args, output_hidden_states)
        pooled = None
        if self.pooler is not None and "pooler" in params:
            pooled = self.pooler(params["pooler"], hidden)
        return BaseModelOutputWithPooling(
            last_hidden_state=hidden, pooler_output=pooled,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None,
            attentions=tuple(probs_sink) if probs_sink is not None else None,
        )


class BertPredictionHeadTransform(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.dense = Linear(config.hidden_size, config.hidden_size, True, dtype=dtype,
                            param_dtype=param_dtype, kernel_init=normal_init(config.initializer_range))
        self.LayerNorm = LayerNorm(config.hidden_size, config.layer_norm_eps, dtype=dtype, param_dtype=param_dtype)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, x):
        return self.LayerNorm(params["LayerNorm"], self.act(self.dense(params["dense"], x)))


class BertLMPredictionHead(Module):
    """cls.predictions: transform + decoder (tied to word embeddings) + bias."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.transform = BertPredictionHeadTransform(config, dtype=dtype, param_dtype=param_dtype)
        self.vocab_size = config.vocab_size

    def init(self, rng):
        params = super().init(rng)
        params["bias"] = jnp.zeros((self.vocab_size,), self.param_dtype)
        return params

    def __call__(self, params, hidden, embedding_table):
        h = self.transform(params["transform"], hidden)
        logits = jnp.dot(h.astype(self.dtype), embedding_table.astype(self.dtype).T)
        return logits + params["bias"].astype(self.dtype)


class BertPreTrainedModel(PreTrainedModel):
    config_class = BertConfig
    base_model_prefix = "bert"


class BertModelStandalone(BertPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.bert = BertModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.bert(params["bert"], *args, **kwargs)


class BertForMaskedLM(BertPreTrainedModel):
    """reference modeling_bert.py BertForMaskedLM (cls.predictions head)."""

    # decoder weight/bias are tied duplicates of word_embeddings /
    # predictions.bias in the checkpoint; our head reads the table directly.
    _keys_to_ignore_on_load_unexpected = (r"cls\.predictions\.decoder\.", r"\.position_ids$")

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.bert = BertModel(config, dtype=self.dtype, param_dtype=self.param_dtype, add_pooling_layer=False)
        self.cls = _BertOnlyMLMHead(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def get_input_embedding_path(self):
        return "bert.embeddings.word_embeddings.weight"

    @property
    def tied_weights_keys(self):
        # decoder weight tied to word embeddings (reference BertForMaskedLM
        # _tied_weights_keys). Our head reads the embedding table directly, so
        # the key never exists in params.
        return ()

    def __call__(self, params, input_ids=None, attention_mask=None, token_type_ids=None,
                 position_ids=None, inputs_embeds=None, labels=None,
                 output_hidden_states=False, **kwargs) -> MaskedLMOutput:
        outputs = self.bert(params["bert"], input_ids, attention_mask, token_type_ids,
                            position_ids, inputs_embeds, output_hidden_states)
        table = params["bert"]["embeddings"]["word_embeddings"]["weight"]
        logits = self.cls(params["cls"], outputs.last_hidden_state, table)
        loss = None
        if labels is not None:
            from ...loss import for_masked_lm_loss

            loss = for_masked_lm_loss(logits, labels, self.config.vocab_size)
        return MaskedLMOutput(loss=loss, logits=logits, hidden_states=outputs.hidden_states)


class _BertOnlyMLMHead(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.predictions = BertLMPredictionHead(config, dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, hidden, table):
        return self.predictions(params["predictions"], hidden, table)


class BertForSequenceClassification(BertPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.num_labels = config.num_labels
        self.bert = BertModel(config, dtype=self.dtype, param_dtype=self.param_dtype)
        self.classifier = Linear(config.hidden_size, config.num_labels, True, dtype=self.dtype,
                                 param_dtype=self.param_dtype, kernel_init=normal_init(config.initializer_range))

    def __call__(self, params, input_ids=None, attention_mask=None, token_type_ids=None,
                 position_ids=None, inputs_embeds=None, labels=None, **kwargs) -> SequenceClassifierOutput:
        outputs = self.bert(params["bert"], input_ids, attention_mask, token_type_ids,
                            position_ids, inputs_embeds)
        logits = self.classifier(params["classifier"], outputs.pooler_output)
        loss = None
        if labels is not None:
            from ...loss import for_sequence_classification_loss

            loss = for_sequence_classification_loss(logits, labels, self.config)
        return SequenceClassifierOutput(loss=loss, logits=logits, hidden_states=outputs.hidden_states)


class BertForTokenClassification(BertPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.num_labels = config.num_labels
        self.bert = BertModel(config, dtype=self.dtype, param_dtype=self.param_dtype, add_pooling_layer=False)
        self.classifier = Linear(config.hidden_size, config.num_labels, True, dtype=self.dtype,
                                 param_dtype=self.param_dtype, kernel_init=normal_init(config.initializer_range))

    def __call__(self, params, input_ids=None, attention_mask=None, token_type_ids=None,
                 position_ids=None, inputs_embeds=None, labels=None, **kwargs) -> TokenClassifierOutput:
        outputs = self.bert(params["bert"], input_ids, attention_mask, token_type_ids,
                            position_ids, inputs_embeds)
        logits = self.classifier(params["classifier"], outputs.last_hidden_state)
        loss = None
        if labels is not None:
            from ...loss import for_token_classification_loss

            loss = for_token_classification_loss(logits, labels, self.config)
        return TokenClassifierOutput(loss=loss, logits=logits, hidden_states=outputs.hidden_states)


class BertForQuestionAnswering(BertPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.bert = BertModel(config, dtype=self.dtype, param_dtype=self.param_dtype, add_pooling_layer=False)
        self.qa_outputs = Linear(config.hidden_size, 2, True, dtype=self.dtype,
                                 param_dtype=self.param_dtype, kernel_init=normal_init(config.initializer_range))

    def __call__(self, params, input_ids=None, attention_mask=None, token_type_ids=None,
                 position_ids=None, inputs_embeds=None, start_positions=None,
                 end_positions=None, **kwargs) -> QuestionAnsweringModelOutput:
        outputs = self.bert(params["bert"], input_ids, attention_mask, token_type_ids,
                            position_ids, inputs_embeds)
        logits = self.qa_outputs(params["qa_outputs"], outputs.last_hidden_state)
        start_logits, end_logits = logits[..., 0], logits[..., 1]
        loss = None
        if start_positions is not None and end_positions is not None:
            from ...loss import for_question_answering_loss

            loss = for_question_answering_loss(start_logits, end_logits, start_positions, end_positions)
        return QuestionAnsweringModelOutput(loss=loss, start_logits=start_logits,
                                            end_logits=end_logits, hidden_states=outputs.hidden_states)
