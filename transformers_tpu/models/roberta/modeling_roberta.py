"""RoBERTa (reference src/transformers/models/roberta/modeling_roberta.py).

BERT skeleton with pad-offset position ids (positions start at
``padding_idx + 1`` and pad slots get ``padding_idx`` —
``create_position_ids_from_input_ids`` in the reference) and its own head
names (``lm_head.{dense,layer_norm,decoder,bias}``, ``classifier.out_proj``).
"""

from __future__ import annotations

import jax.numpy as jnp

from ...core.module import LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import MaskedLMOutput, SequenceClassifierOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ..bert.modeling_bert import (
    BertEmbeddings,
    BertForQuestionAnswering,
    BertForTokenClassification,
    BertModel,
)
from .configuration_roberta import RobertaConfig


class RobertaEmbeddings(BertEmbeddings):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.padding_idx = config.pad_token_id

    def position_ids_from_input_ids(self, input_ids):
        mask = (input_ids != self.padding_idx).astype(jnp.int32)
        incremental = jnp.cumsum(mask, axis=1) * mask
        return incremental + self.padding_idx

    def __call__(self, params, input_ids, token_type_ids=None, position_ids=None, inputs_embeds=None):
        if position_ids is None and input_ids is not None:
            position_ids = self.position_ids_from_input_ids(input_ids)
        return super().__call__(params, input_ids, token_type_ids, position_ids, inputs_embeds)


class RobertaModel(BertModel):
    embeddings_cls = RobertaEmbeddings


class RobertaPreTrainedModel(PreTrainedModel):
    config_class = RobertaConfig
    base_model_prefix = "roberta"


class RobertaModelStandalone(RobertaPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.roberta = RobertaModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.roberta(params["roberta"], *args, **kwargs)


class RobertaLMHead(Module):
    """lm_head: dense -> gelu -> layer_norm -> tied decoder + bias."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(config.initializer_range))
        self.dense = Linear(config.hidden_size, config.hidden_size, True, **kw)
        self.layer_norm = LayerNorm(config.hidden_size, config.layer_norm_eps, dtype=dtype, param_dtype=param_dtype)
        self.vocab_size = config.vocab_size
        self.act = get_activation("gelu")

    def init(self, rng):
        params = super().init(rng)
        params["bias"] = jnp.zeros((self.vocab_size,), self.param_dtype)
        return params

    def __call__(self, params, hidden, table):
        h = self.act(self.dense(params["dense"], hidden))
        h = self.layer_norm(params["layer_norm"], h)
        return jnp.dot(h.astype(self.dtype), table.astype(self.dtype).T) + params["bias"].astype(self.dtype)


class RobertaForMaskedLM(RobertaPreTrainedModel):
    _keys_to_ignore_on_load_unexpected = (r"lm_head\.decoder\.", r"\.position_ids$")

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.roberta = RobertaModel(config, dtype=self.dtype, param_dtype=self.param_dtype,
                                    add_pooling_layer=False)
        self.lm_head = RobertaLMHead(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def get_input_embedding_path(self):
        return "roberta.embeddings.word_embeddings.weight"

    def __call__(self, params, input_ids=None, attention_mask=None, token_type_ids=None,
                 position_ids=None, inputs_embeds=None, labels=None,
                 output_hidden_states=False, **kwargs) -> MaskedLMOutput:
        outputs = self.roberta(params["roberta"], input_ids, attention_mask, token_type_ids,
                               position_ids, inputs_embeds, output_hidden_states)
        table = params["roberta"]["embeddings"]["word_embeddings"]["weight"]
        logits = self.lm_head(params["lm_head"], outputs.last_hidden_state, table)
        loss = None
        if labels is not None:
            from ...loss import for_masked_lm_loss

            loss = for_masked_lm_loss(logits, labels, self.config.vocab_size)
        return MaskedLMOutput(loss=loss, logits=logits, hidden_states=outputs.hidden_states)


class RobertaClassificationHead(Module):
    """classifier: dense on <s> token -> tanh -> out_proj."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(config.initializer_range))
        self.dense = Linear(config.hidden_size, config.hidden_size, True, **kw)
        self.out_proj = Linear(config.hidden_size, config.num_labels, True, **kw)

    def __call__(self, params, hidden):
        x = hidden[:, 0]
        x = jnp.tanh(self.dense(params["dense"], x))
        return self.out_proj(params["out_proj"], x)


class RobertaForSequenceClassification(RobertaPreTrainedModel):
    _keys_to_ignore_on_load_unexpected = (r"\.position_ids$",)

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.num_labels = config.num_labels
        self.roberta = RobertaModel(config, dtype=self.dtype, param_dtype=self.param_dtype,
                                    add_pooling_layer=False)
        self.classifier = RobertaClassificationHead(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, input_ids=None, attention_mask=None, token_type_ids=None,
                 position_ids=None, inputs_embeds=None, labels=None, **kwargs) -> SequenceClassifierOutput:
        outputs = self.roberta(params["roberta"], input_ids, attention_mask, token_type_ids,
                               position_ids, inputs_embeds)
        logits = self.classifier(params["classifier"], outputs.last_hidden_state)
        loss = None
        if labels is not None:
            from ...loss import for_sequence_classification_loss

            loss = for_sequence_classification_loss(logits, labels, self.config)
        return SequenceClassifierOutput(loss=loss, logits=logits, hidden_states=outputs.hidden_states)


class RobertaForTokenClassification(BertForTokenClassification):
    config_class = RobertaConfig
    base_model_prefix = "roberta"
    _keys_to_ignore_on_load_unexpected = (r"\.position_ids$",)

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        PreTrainedModel.__init__(self, config, dtype=dtype, param_dtype=param_dtype)
        self.num_labels = config.num_labels
        self.roberta = RobertaModel(config, dtype=self.dtype, param_dtype=self.param_dtype,
                                    add_pooling_layer=False)
        self.classifier = Linear(config.hidden_size, config.num_labels, True, dtype=self.dtype,
                                 param_dtype=self.param_dtype, kernel_init=normal_init(config.initializer_range))

    def __call__(self, params, input_ids=None, attention_mask=None, token_type_ids=None,
                 position_ids=None, inputs_embeds=None, labels=None, **kwargs):
        outputs = self.roberta(params["roberta"], input_ids, attention_mask, token_type_ids,
                               position_ids, inputs_embeds)
        logits = self.classifier(params["classifier"], outputs.last_hidden_state)
        loss = None
        if labels is not None:
            from ...loss import for_token_classification_loss

            loss = for_token_classification_loss(logits, labels, self.config)
        from ...modeling_outputs import TokenClassifierOutput

        return TokenClassifierOutput(loss=loss, logits=logits, hidden_states=outputs.hidden_states)


class RobertaForQuestionAnswering(BertForQuestionAnswering):
    config_class = RobertaConfig
    base_model_prefix = "roberta"
    _keys_to_ignore_on_load_unexpected = (r"\.position_ids$",)

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        PreTrainedModel.__init__(self, config, dtype=dtype, param_dtype=param_dtype)
        self.roberta = RobertaModel(config, dtype=self.dtype, param_dtype=self.param_dtype,
                                    add_pooling_layer=False)
        self.qa_outputs = Linear(config.hidden_size, 2, True, dtype=self.dtype,
                                 param_dtype=self.param_dtype, kernel_init=normal_init(config.initializer_range))

    def __call__(self, params, input_ids=None, attention_mask=None, token_type_ids=None,
                 position_ids=None, inputs_embeds=None, start_positions=None,
                 end_positions=None, **kwargs):
        outputs = self.roberta(params["roberta"], input_ids, attention_mask, token_type_ids,
                               position_ids, inputs_embeds)
        logits = self.qa_outputs(params["qa_outputs"], outputs.last_hidden_state)
        start_logits, end_logits = logits[..., 0], logits[..., 1]
        loss = None
        if start_positions is not None and end_positions is not None:
            from ...loss import for_question_answering_loss

            loss = for_question_answering_loss(start_logits, end_logits, start_positions, end_positions)
        from ...modeling_outputs import QuestionAnsweringModelOutput

        return QuestionAnsweringModelOutput(loss=loss, start_logits=start_logits,
                                            end_logits=end_logits, hidden_states=outputs.hidden_states)
