"""ELECTRA encoder, TPU-native.

Semantics match reference src/transformers/models/electra/modeling_electra.py:
BERT-style encoder with FACTORIZED embeddings (embedding_size != hidden_size
projected by ``embeddings_project``, :550-551), discriminator head
dense→act→dense_prediction (:465), generator MLM head dense→gelu→LN→tied
lm_head over embedding_size (:484, :976), and a gelu classification head on
CLS (:666 — "although BERT uses tanh here"). Checkpoint layout:
``electra.{embeddings,encoder.layer.N}`` (no pooler).
"""

from __future__ import annotations

import jax.numpy as jnp

from ...core.module import Embedding, LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import (
    BaseModelOutputWithPooling,
    MaskedLMOutput,
    SequenceClassifierOutput,
    TokenClassifierOutput,
)
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ..bert.modeling_bert import BertEmbeddings, BertEncoder
from .configuration_electra import ElectraConfig


class ElectraEmbeddings(BertEmbeddings):
    """BertEmbeddings over ``embedding_size`` (reference :56)."""

    def __init__(self, config, *, dtype, param_dtype):
        import copy

        shim = copy.copy(config)
        shim.hidden_size = config.embedding_size
        super().__init__(shim, dtype=dtype, param_dtype=param_dtype)


class ElectraModel(Module):
    def __init__(self, config: ElectraConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embeddings = ElectraEmbeddings(config, **kw)
        if config.embedding_size != config.hidden_size:
            self.embeddings_project = Linear(config.embedding_size, config.hidden_size, True,
                                             dtype=dtype, param_dtype=param_dtype,
                                             kernel_init=normal_init(config.initializer_range))
        else:
            self.embeddings_project = None
        self.encoder = BertEncoder(config, **kw)

    def __call__(self, params, input_ids=None, attention_mask=None, token_type_ids=None,
                 position_ids=None, inputs_embeds=None, output_hidden_states=False,
                 output_attentions=False) -> BaseModelOutputWithPooling:
        hidden = self.embeddings(params["embeddings"], input_ids, token_type_ids,
                                 position_ids, inputs_embeds)
        if self.embeddings_project is not None:
            hidden = self.embeddings_project(params["embeddings_project"], hidden)
        b, s, _ = hidden.shape
        kv_valid = attention_mask if attention_mask is not None else jnp.ones((b, s), jnp.int32)
        attn_args = {"kv_valid": kv_valid, "is_causal": False}
        probs_sink = [] if output_attentions else None
        if output_attentions:
            attn_args["probs_sink"] = probs_sink
        hidden, all_hidden = self.encoder(params["encoder"], hidden, attn_args, output_hidden_states)
        return BaseModelOutputWithPooling(
            last_hidden_state=hidden, pooler_output=None,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None,
            attentions=tuple(probs_sink) if probs_sink is not None else None,
        )


class ElectraPreTrainedModel(PreTrainedModel):
    config_class = ElectraConfig
    base_model_prefix = "electra"


class ElectraModelStandalone(ElectraPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.electra = ElectraModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.electra(params["electra"], *args, **kwargs)


class ElectraForPreTraining(ElectraPreTrainedModel):
    """Replaced-token discriminator (reference :465 + ForPreTraining)."""

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.electra = ElectraModel(config, dtype=self.dtype, param_dtype=self.param_dtype)
        self.discriminator_predictions = _DiscriminatorPredictions(config, **kw)

    def __call__(self, params, input_ids=None, attention_mask=None, **kwargs):
        out = self.electra(params["electra"], input_ids, attention_mask, **kwargs)
        logits = self.discriminator_predictions(
            params["discriminator_predictions"], out.last_hidden_state)
        return SequenceClassifierOutput(logits=logits, hidden_states=out.hidden_states)


class _DiscriminatorPredictions(Module):
    def __init__(self, config, *, dtype, param_dtype, kernel_init):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=kernel_init)
        self.dense = Linear(config.hidden_size, config.hidden_size, True, **kw)
        self.dense_prediction = Linear(config.hidden_size, 1, True, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, hidden):
        h = self.act(self.dense(params["dense"], hidden))
        return self.dense_prediction(params["dense_prediction"], h)[..., 0]


class _GeneratorPredictions(Module):
    def __init__(self, config, *, dtype, param_dtype, kernel_init):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.dense = Linear(config.hidden_size, config.embedding_size, True,
                            dtype=dtype, param_dtype=param_dtype, kernel_init=kernel_init)
        self.LayerNorm = LayerNorm(config.embedding_size, config.layer_norm_eps,
                                   dtype=dtype, param_dtype=param_dtype)
        self.act = get_activation("gelu")

    def __call__(self, params, hidden):
        return self.LayerNorm(params["LayerNorm"], self.act(self.dense(params["dense"], hidden)))


class ElectraForMaskedLM(ElectraPreTrainedModel):
    """Generator head; lm_head weight tied to word embeddings (reference :968)."""

    _tied_weights_keys = ("generator_lm_head.weight",)
    _keys_to_ignore_on_load_unexpected = (r"generator_lm_head\.weight", r"\.position_ids$")

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.electra = ElectraModel(config, dtype=self.dtype, param_dtype=self.param_dtype)
        self.generator_predictions = _GeneratorPredictions(config, **kw)
        self.vocab_size = config.vocab_size

    def init(self, rng):
        params = super().init(rng)
        params["generator_lm_head"] = {"bias": jnp.zeros((self.vocab_size,), self.param_dtype)}
        return params

    def get_input_embedding_path(self):
        return "electra.embeddings.word_embeddings.weight"

    @property
    def tied_weights_keys(self):
        return ()  # tied via attend(), never materialized

    def __call__(self, params, input_ids=None, attention_mask=None, labels=None, **kwargs):
        out = self.electra(params["electra"], input_ids, attention_mask, **kwargs)
        h = self.generator_predictions(params["generator_predictions"], out.last_hidden_state)
        logits = self.electra.embeddings.word_embeddings.attend(
            params["electra"]["embeddings"]["word_embeddings"], h)
        logits = logits + params["generator_lm_head"]["bias"].astype(logits.dtype)
        loss = None
        if labels is not None:
            from ...loss import for_masked_lm_loss

            loss = for_masked_lm_loss(logits, labels, self.vocab_size)
        return MaskedLMOutput(loss=loss, logits=logits, hidden_states=out.hidden_states)


class ElectraForSequenceClassification(ElectraPreTrainedModel):
    """CLS -> dense -> gelu -> out_proj (reference :666)."""

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.electra = ElectraModel(config, dtype=self.dtype, param_dtype=self.param_dtype)
        self.classifier = _ClassificationHead(config, **kw)
        self.num_labels = config.num_labels

    def __call__(self, params, input_ids=None, attention_mask=None, labels=None, **kwargs):
        out = self.electra(params["electra"], input_ids, attention_mask, **kwargs)
        logits = self.classifier(params["classifier"], out.last_hidden_state)
        loss = None
        if labels is not None:
            from ...loss import for_sequence_classification_loss

            loss = for_sequence_classification_loss(logits, labels, self.config)
        return SequenceClassifierOutput(loss=loss, logits=logits, hidden_states=out.hidden_states)


class _ClassificationHead(Module):
    def __init__(self, config, *, dtype, param_dtype, kernel_init):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=kernel_init)
        self.dense = Linear(config.hidden_size, config.hidden_size, True, **kw)
        self.out_proj = Linear(config.hidden_size, config.num_labels, True, **kw)
        self.act = get_activation("gelu")

    def __call__(self, params, hidden):
        x = hidden[:, 0]
        x = self.act(self.dense(params["dense"], x))
        return self.out_proj(params["out_proj"], x)


class ElectraForTokenClassification(ElectraPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.electra = ElectraModel(config, dtype=self.dtype, param_dtype=self.param_dtype)
        self.classifier = Linear(config.hidden_size, config.num_labels, True,
                                 dtype=self.dtype, param_dtype=self.param_dtype,
                                 kernel_init=normal_init(config.initializer_range))
        self.num_labels = config.num_labels

    def __call__(self, params, input_ids=None, attention_mask=None, labels=None, **kwargs):
        out = self.electra(params["electra"], input_ids, attention_mask, **kwargs)
        logits = self.classifier(params["classifier"], out.last_hidden_state)
        loss = None
        if labels is not None:
            from ...loss import for_token_classification_loss

            loss = for_token_classification_loss(logits, labels, self.config)
        return TokenClassifierOutput(loss=loss, logits=logits, hidden_states=out.hidden_states)
