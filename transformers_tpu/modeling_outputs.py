"""Typed model outputs (reference src/transformers/modeling_outputs.py).

Registered JAX pytrees (via ModelOutput) so they flow through jit unchanged.
Only the heavily-used subset is defined; task models add their own.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax.numpy as jnp

from .utils.generic import ModelOutput

Array = jnp.ndarray


@dataclass
class BaseModelOutput(ModelOutput):
    last_hidden_state: Optional[Array] = None
    hidden_states: Optional[tuple] = None
    attentions: Optional[tuple] = None


@dataclass
class BaseModelOutputWithPooling(ModelOutput):
    last_hidden_state: Optional[Array] = None
    pooler_output: Optional[Array] = None
    hidden_states: Optional[tuple] = None
    attentions: Optional[tuple] = None
    past_key_values: Optional[Any] = None


@dataclass
class BaseModelOutputWithPast(ModelOutput):
    last_hidden_state: Optional[Array] = None
    past_key_values: Optional[Any] = None
    hidden_states: Optional[tuple] = None
    attentions: Optional[tuple] = None


@dataclass
class CausalLMOutputWithPast(ModelOutput):
    loss: Optional[Array] = None
    logits: Optional[Array] = None
    past_key_values: Optional[Any] = None
    hidden_states: Optional[tuple] = None
    attentions: Optional[tuple] = None


@dataclass
class CausalLMOutput(ModelOutput):
    loss: Optional[Array] = None
    logits: Optional[Array] = None
    hidden_states: Optional[tuple] = None
    attentions: Optional[tuple] = None
    past_key_values: Optional[Any] = None


@dataclass
class MaskedLMOutput(ModelOutput):
    loss: Optional[Array] = None
    logits: Optional[Array] = None
    hidden_states: Optional[tuple] = None
    attentions: Optional[tuple] = None


@dataclass
class SequenceClassifierOutput(ModelOutput):
    loss: Optional[Array] = None
    logits: Optional[Array] = None
    hidden_states: Optional[tuple] = None
    attentions: Optional[tuple] = None


@dataclass
class SequenceClassifierOutputWithPast(ModelOutput):
    loss: Optional[Array] = None
    logits: Optional[Array] = None
    past_key_values: Optional[Any] = None
    hidden_states: Optional[tuple] = None
    attentions: Optional[tuple] = None


@dataclass
class TokenClassifierOutput(ModelOutput):
    loss: Optional[Array] = None
    logits: Optional[Array] = None
    hidden_states: Optional[tuple] = None
    attentions: Optional[tuple] = None


@dataclass
class QuestionAnsweringModelOutput(ModelOutput):
    loss: Optional[Array] = None
    start_logits: Optional[Array] = None
    end_logits: Optional[Array] = None
    hidden_states: Optional[tuple] = None
    attentions: Optional[tuple] = None


@dataclass
class ImageClassifierOutput(ModelOutput):
    loss: Optional[Array] = None
    logits: Optional[Array] = None
    hidden_states: Optional[tuple] = None
    attentions: Optional[tuple] = None


@dataclass
class ImageSuperResolutionOutput(ModelOutput):
    """reference modeling_outputs.py ImageSuperResolutionOutput."""

    loss: Optional[jnp.ndarray] = None
    reconstruction: Optional[jnp.ndarray] = None
    hidden_states: Optional[tuple] = None
    attentions: Optional[tuple] = None


@dataclass
class Seq2SeqModelOutput(ModelOutput):
    last_hidden_state: Optional[Array] = None
    past_key_values: Optional[Any] = None
    decoder_hidden_states: Optional[tuple] = None
    decoder_attentions: Optional[tuple] = None
    cross_attentions: Optional[tuple] = None
    encoder_last_hidden_state: Optional[Array] = None
    encoder_hidden_states: Optional[tuple] = None
    encoder_attentions: Optional[tuple] = None


@dataclass
class Seq2SeqLMOutput(ModelOutput):
    loss: Optional[Array] = None
    logits: Optional[Array] = None
    past_key_values: Optional[Any] = None
    decoder_hidden_states: Optional[tuple] = None
    decoder_attentions: Optional[tuple] = None
    cross_attentions: Optional[tuple] = None
    encoder_last_hidden_state: Optional[Array] = None
    encoder_hidden_states: Optional[tuple] = None
    encoder_attentions: Optional[tuple] = None
