"""LayoutLM (reference src/transformers/models/layoutlm/modeling_layoutlm.py).

BERT encoder whose embeddings add 2D layout positions from token bounding
boxes normalized to [0, 1000] (:48-115): x/y tables indexed at the box
corners plus height/width tables indexed at the box extents. Backs the
document-question-answering pipeline.
"""

from __future__ import annotations

import jax.numpy as jnp

from ...core.module import Embedding, Linear, Module, normal_init
from ...modeling_outputs import (
    BaseModelOutputWithPooling,
    QuestionAnsweringModelOutput,
    SequenceClassifierOutput,
    TokenClassifierOutput,
)
from ...modeling_utils import PreTrainedModel
from ..bert.modeling_bert import BertEmbeddings, BertEncoder, BertPooler
from .configuration_layoutlm import LayoutLMConfig


class LayoutLMEmbeddings(BertEmbeddings):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  embedding_init=normal_init(config.initializer_range))
        n2d = config.max_2d_position_embeddings
        self.x_position_embeddings = Embedding(n2d, config.hidden_size, **kw)
        self.y_position_embeddings = Embedding(n2d, config.hidden_size, **kw)
        self.h_position_embeddings = Embedding(n2d, config.hidden_size, **kw)
        self.w_position_embeddings = Embedding(n2d, config.hidden_size, **kw)

    def __call__(self, params, input_ids, bbox=None, token_type_ids=None,
                 position_ids=None, inputs_embeds=None):
        if inputs_embeds is None:
            inputs_embeds = self.word_embeddings(params["word_embeddings"], input_ids)
        if position_ids is None:
            position_ids = self.position_ids(input_ids)
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        if bbox is None:
            bbox = jnp.zeros((*input_ids.shape, 4), jnp.int32)
        h = (
            inputs_embeds
            + self.position_embeddings(params["position_embeddings"], position_ids)
            + self.x_position_embeddings(params["x_position_embeddings"], bbox[:, :, 0])
            + self.y_position_embeddings(params["y_position_embeddings"], bbox[:, :, 1])
            + self.x_position_embeddings(params["x_position_embeddings"], bbox[:, :, 2])
            + self.y_position_embeddings(params["y_position_embeddings"], bbox[:, :, 3])
            + self.h_position_embeddings(params["h_position_embeddings"],
                                         bbox[:, :, 3] - bbox[:, :, 1])
            + self.w_position_embeddings(params["w_position_embeddings"],
                                         bbox[:, :, 2] - bbox[:, :, 0])
            + self.token_type_embeddings(params["token_type_embeddings"], token_type_ids)
        )
        return self.LayerNorm(params["LayerNorm"], h)


class LayoutLMModel(Module):
    def __init__(self, config: LayoutLMConfig, *, dtype, param_dtype, add_pooling_layer=True):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embeddings = LayoutLMEmbeddings(config, **kw)
        self.encoder = BertEncoder(config, **kw)
        self.pooler = BertPooler(config, **kw) if add_pooling_layer else None

    def __call__(self, params, input_ids=None, bbox=None, attention_mask=None,
                 token_type_ids=None, position_ids=None, inputs_embeds=None,
                 output_hidden_states=False) -> BaseModelOutputWithPooling:
        hidden = self.embeddings(params["embeddings"], input_ids, bbox, token_type_ids,
                                 position_ids, inputs_embeds)
        b, s, _ = hidden.shape
        kv_valid = attention_mask if attention_mask is not None else jnp.ones((b, s), jnp.int32)
        attn_args = {"kv_valid": kv_valid, "is_causal": False}
        hidden, all_hidden = self.encoder(params["encoder"], hidden, attn_args, output_hidden_states)
        pooled = None
        if self.pooler is not None and "pooler" in params:
            pooled = self.pooler(params["pooler"], hidden)
        return BaseModelOutputWithPooling(
            last_hidden_state=hidden, pooler_output=pooled,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None,
        )


class LayoutLMPreTrainedModel(PreTrainedModel):
    config_class = LayoutLMConfig
    base_model_prefix = "layoutlm"


class LayoutLMModelStandalone(LayoutLMPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.layoutlm = LayoutLMModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.layoutlm(params["layoutlm"], *args, **kwargs)


class LayoutLMForQuestionAnswering(LayoutLMPreTrainedModel):
    """Extractive QA over document tokens (the document-question-answering
    pipeline's model; reference LayoutLMForQuestionAnswering)."""

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.layoutlm = LayoutLMModel(config, dtype=self.dtype, param_dtype=self.param_dtype,
                                      add_pooling_layer=False)
        self.qa_outputs = Linear(config.hidden_size, 2, True, dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 kernel_init=normal_init(config.initializer_range))

    def __call__(self, params, input_ids=None, bbox=None, attention_mask=None,
                 token_type_ids=None, position_ids=None, inputs_embeds=None,
                 start_positions=None, end_positions=None, **kwargs) -> QuestionAnsweringModelOutput:
        outputs = self.layoutlm(params["layoutlm"], input_ids, bbox, attention_mask,
                                token_type_ids, position_ids, inputs_embeds)
        logits = self.qa_outputs(params["qa_outputs"], outputs.last_hidden_state)
        start_logits, end_logits = logits[..., 0], logits[..., 1]
        loss = None
        if start_positions is not None and end_positions is not None:
            from ...loss import for_question_answering_loss

            loss = for_question_answering_loss(start_logits, end_logits,
                                               start_positions, end_positions)
        return QuestionAnsweringModelOutput(loss=loss, start_logits=start_logits,
                                            end_logits=end_logits,
                                            hidden_states=outputs.hidden_states)


class LayoutLMForSequenceClassification(LayoutLMPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.layoutlm = LayoutLMModel(config, dtype=self.dtype, param_dtype=self.param_dtype)
        self.classifier = Linear(config.hidden_size, config.num_labels, True, dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 kernel_init=normal_init(config.initializer_range))

    def __call__(self, params, input_ids=None, bbox=None, attention_mask=None,
                 token_type_ids=None, labels=None, **kwargs) -> SequenceClassifierOutput:
        outputs = self.layoutlm(params["layoutlm"], input_ids, bbox, attention_mask,
                                token_type_ids)
        logits = self.classifier(params["classifier"], outputs.pooler_output)
        loss = None
        if labels is not None:
            from ...loss import for_sequence_classification_loss

            loss = for_sequence_classification_loss(logits, labels, self.config)
        return SequenceClassifierOutput(loss=loss, logits=logits,
                                        hidden_states=outputs.hidden_states)


class LayoutLMForTokenClassification(LayoutLMPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.layoutlm = LayoutLMModel(config, dtype=self.dtype, param_dtype=self.param_dtype)
        self.classifier = Linear(config.hidden_size, config.num_labels, True, dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 kernel_init=normal_init(config.initializer_range))

    def __call__(self, params, input_ids=None, bbox=None, attention_mask=None,
                 token_type_ids=None, labels=None, **kwargs) -> TokenClassifierOutput:
        outputs = self.layoutlm(params["layoutlm"], input_ids, bbox, attention_mask,
                                token_type_ids)
        logits = self.classifier(params["classifier"], outputs.last_hidden_state)
        loss = None
        if labels is not None:
            from ...loss import for_token_classification_loss

            loss = for_token_classification_loss(logits, labels, self.config)
        return TokenClassifierOutput(loss=loss, logits=logits,
                                     hidden_states=outputs.hidden_states)
