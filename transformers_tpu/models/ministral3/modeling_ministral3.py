"""Ministral3 (reference src/transformers/models/ministral3/modular_ministral3.py).

Mistral skeleton + llama-4-style position-dependent query temperature:
q *= 1 + beta * log(1 + floor(pos / original_max_position_embeddings))
(reference get_llama_4_attn_scale :29), applied after rope."""

from __future__ import annotations

import jax.numpy as jnp

from ...modeling_layers import (
    GenericForQuestionAnswering,
    GenericForSequenceClassification,
    GenericForTokenClassification,
)
from ..llama.modeling_llama import DECODER_TP_PLAN
from ..mistral.modeling_mistral import (
    MistralAttention,
    MistralDecoderLayer,
    MistralForCausalLM,
    MistralModel,
    MistralModelStandalone,
)
from .configuration_ministral3 import Ministral3Config


class Ministral3Attention(MistralAttention):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        rs = config.rope_scaling or {}
        self.llama4_beta = rs.get("llama_4_scaling_beta")
        self.llama4_orig_max = rs.get("original_max_position_embeddings",
                                      config.max_position_embeddings)

    def __call__(self, params, hidden, cos, sin, attn_args, cache, cache_position):
        object.__setattr__(self, "_q_positions", attn_args["q_positions"])
        return super().__call__(params, hidden, cos, sin, attn_args, cache,
                                cache_position)

    def post_rope_qk(self, params, q, k):
        if self.llama4_beta is not None:
            pos = self._q_positions.astype(jnp.float32)
            scale = 1.0 + self.llama4_beta * jnp.log1p(
                jnp.floor(pos / self.llama4_orig_max))
            q = (q * scale[:, :, None, None]).astype(q.dtype)
        return q, k


class Ministral3DecoderLayer(MistralDecoderLayer):
    attention_cls = Ministral3Attention


class Ministral3Model(MistralModel):
    decoder_layer_cls = Ministral3DecoderLayer


class Ministral3ForCausalLM(MistralForCausalLM):
    config_class = Ministral3Config
    model_cls = Ministral3Model
    _tp_plan = DECODER_TP_PLAN


class Ministral3ModelStandalone(MistralModelStandalone):
    config_class = Ministral3Config
    model_cls = Ministral3Model


class Ministral3ForSequenceClassification(GenericForSequenceClassification):
    config_class = Ministral3Config
    model_cls = Ministral3Model


class Ministral3ForTokenClassification(GenericForTokenClassification):
    config_class = Ministral3Config
    model_cls = Ministral3Model


class Ministral3ForQuestionAnswering(GenericForQuestionAnswering):
    config_class = Ministral3Config
    model_cls = Ministral3Model
