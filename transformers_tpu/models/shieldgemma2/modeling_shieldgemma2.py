"""ShieldGemma 2 (reference models/shieldgemma2/modeling_shieldgemma2.py):
policy-violation image classifier over a Gemma3 image-text model — the
verdict is softmax over the last position's [yes, no] token logits."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from ...core.loading import WeightRule
from ...modeling_outputs import ModelOutput
from ..gemma3.modeling_gemma3 import Gemma3ForConditionalGeneration
from .configuration_shieldgemma2 import ShieldGemma2Config


@dataclass
class ShieldGemma2ImageClassifierOutputWithNoAttention(ModelOutput):
    logits: Optional[jnp.ndarray] = None
    probabilities: Optional[jnp.ndarray] = None


class ShieldGemma2ForImageClassification(Gemma3ForConditionalGeneration):
    """Reference :40-118. logits[:, 0] = Yes (violates), logits[:, 1] = No."""

    config_class = ShieldGemma2Config
    # the torch class nests a full Gemma3ForConditionalGeneration under
    # ``model``; flatten its prefix onto our own structure
    _weight_rules = (
        WeightRule(pattern=r"^model\.", rename=""),
    ) + Gemma3ForConditionalGeneration._weight_rules

    def __call__(self, params, input_ids=None, pixel_values=None,
                 attention_mask=None, position_ids=None, past_key_values=None,
                 cache_position=0, inputs_embeds=None, token_type_ids=None,
                 **kwargs):
        outputs = super().__call__(
            params, input_ids=input_ids, pixel_values=pixel_values,
            attention_mask=attention_mask, position_ids=position_ids,
            past_key_values=past_key_values, cache_position=cache_position,
            inputs_embeds=inputs_embeds, token_type_ids=token_type_ids,
            **kwargs)
        selected = outputs.logits[:, -1][:, jnp.asarray(
            [self.config.yes_token_index, self.config.no_token_index])]
        return ShieldGemma2ImageClassifierOutputWithNoAttention(
            logits=selected,
            probabilities=jax.nn.softmax(selected, axis=-1))
