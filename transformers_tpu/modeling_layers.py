"""Generic task heads for decoder backbones.

TPU-native analog of reference src/transformers/modeling_layers.py
(``GenericForSequenceClassification`` :118, ``GenericForQuestionAnswering``
:193, ``GenericForTokenClassification`` :254). A family adds a task model by
subclassing and setting ``config_class`` + ``model_cls`` — the backbone param
subtree keeps its checkpoint prefix ("model" / "transformer").
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from .core.module import Linear, Module, normal_init
from .modeling_outputs import (
    QuestionAnsweringModelOutput,
    SequenceClassifierOutputWithPast,
    TokenClassifierOutput,
)
from .modeling_utils import PreTrainedModel


def last_token_indices(input_ids, attention_mask, pad_token_id) -> jnp.ndarray:
    """Index of the sequence-summary token per row (reference
    modeling_layers.py:146: argmax over token_indices * (ids != pad) —
    attention_mask is deliberately NOT consulted, matching the reference)."""
    if input_ids is None or pad_token_id is None:
        if attention_mask is not None:
            return jnp.maximum(jnp.sum(attention_mask.astype(jnp.int32), axis=-1) - 1, 0)
        s = input_ids.shape[1]
        return jnp.full((input_ids.shape[0],), s - 1, jnp.int32)
    non_pad = (input_ids != pad_token_id).astype(jnp.int32)
    idx = jnp.arange(input_ids.shape[1], dtype=jnp.int32)[None, :]
    return jnp.argmax(idx * non_pad, axis=-1).astype(jnp.int32)


class GenericForSequenceClassification(PreTrainedModel):
    """Backbone + ``score`` head pooled at the last non-pad token."""

    model_cls = None
    base_model_prefix = "model"

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.num_labels = config.num_labels
        self.model = self.model_cls(config, dtype=self.dtype, param_dtype=self.param_dtype)
        self.score = Linear(config.hidden_size, self.num_labels, False, dtype=self.dtype,
                            param_dtype=self.param_dtype, kernel_init=normal_init(0.02))

    def __call__(self, params, input_ids=None, attention_mask=None, position_ids=None,
                 past_key_values=None, cache_position=0, inputs_embeds=None, labels=None,
                 **kwargs) -> SequenceClassifierOutputWithPast:
        outputs = self.model(params["model"], input_ids, attention_mask, position_ids,
                             past_key_values, cache_position, inputs_embeds)
        logits = self.score(params["score"], outputs.last_hidden_state)  # [B, S, L]
        idx = last_token_indices(input_ids, attention_mask, self.config.pad_token_id)
        pooled = jnp.take_along_axis(logits, idx[:, None, None].astype(jnp.int32), axis=1)[:, 0]
        loss = None
        if labels is not None:
            from .loss import for_sequence_classification_loss

            loss = for_sequence_classification_loss(pooled, labels, self.config)
        return SequenceClassifierOutputWithPast(
            loss=loss, logits=pooled, past_key_values=outputs.past_key_values,
            hidden_states=outputs.hidden_states,
        )


class GenericForTokenClassification(PreTrainedModel):
    model_cls = None
    base_model_prefix = "model"

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.num_labels = config.num_labels
        self.model = self.model_cls(config, dtype=self.dtype, param_dtype=self.param_dtype)
        self.score = Linear(config.hidden_size, self.num_labels, True, dtype=self.dtype,
                            param_dtype=self.param_dtype, kernel_init=normal_init(0.02))

    def __call__(self, params, input_ids=None, attention_mask=None, position_ids=None,
                 past_key_values=None, cache_position=0, inputs_embeds=None, labels=None,
                 **kwargs) -> TokenClassifierOutput:
        outputs = self.model(params["model"], input_ids, attention_mask, position_ids,
                             past_key_values, cache_position, inputs_embeds)
        logits = self.score(params["score"], outputs.last_hidden_state)
        loss = None
        if labels is not None:
            from .loss import for_token_classification_loss

            loss = for_token_classification_loss(logits, labels, self.config)
        return TokenClassifierOutput(loss=loss, logits=logits, hidden_states=outputs.hidden_states)


class GenericForQuestionAnswering(PreTrainedModel):
    model_cls = None
    base_model_prefix = "transformer"

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.transformer = self.model_cls(config, dtype=self.dtype, param_dtype=self.param_dtype)
        self.qa_outputs = Linear(config.hidden_size, 2, True, dtype=self.dtype,
                                 param_dtype=self.param_dtype, kernel_init=normal_init(0.02))

    def __call__(self, params, input_ids=None, attention_mask=None, position_ids=None,
                 past_key_values=None, cache_position=0, inputs_embeds=None,
                 start_positions=None, end_positions=None, **kwargs) -> QuestionAnsweringModelOutput:
        outputs = self.transformer(params["transformer"], input_ids, attention_mask, position_ids,
                                   past_key_values, cache_position, inputs_embeds)
        logits = self.qa_outputs(params["qa_outputs"], outputs.last_hidden_state)
        start_logits = logits[..., 0]
        end_logits = logits[..., 1]
        loss = None
        if start_positions is not None and end_positions is not None:
            from .loss import for_question_answering_loss

            loss = for_question_answering_loss(start_logits, end_logits, start_positions, end_positions)
        return QuestionAnsweringModelOutput(
            loss=loss, start_logits=start_logits, end_logits=end_logits,
            hidden_states=outputs.hidden_states,
        )

