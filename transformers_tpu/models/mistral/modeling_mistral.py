"""Mistral decoder (reference src/transformers/models/mistral/modeling_mistral.py).

Llama skeleton + uniform sliding-window attention; the window is config-driven
(``layer_sliding_window``), so the model is a pure config swap. The reference
expresses this the same way via its modular system
(models/mistral/modular_mistral.py inherits llama classes).
"""

from __future__ import annotations

from ..llama.modeling_llama import (
    LlamaAttention,
    LlamaDecoderLayer,
    LlamaForCausalLM,
    LlamaMLP,
    LlamaModel,
    LlamaModelStandalone,
)
from .configuration_mistral import MistralConfig


class MistralMLP(LlamaMLP):
    pass


class MistralAttention(LlamaAttention):
    pass


class MistralDecoderLayer(LlamaDecoderLayer):
    attention_cls = MistralAttention
    mlp_cls = MistralMLP


class MistralModel(LlamaModel):
    decoder_layer_cls = MistralDecoderLayer


class MistralForCausalLM(LlamaForCausalLM):
    config_class = MistralConfig
    model_cls = MistralModel


class MistralModelStandalone(LlamaModelStandalone):
    config_class = MistralConfig
    model_cls = MistralModel


from ...modeling_layers import (  # noqa: E402
    GenericForQuestionAnswering,
    GenericForSequenceClassification,
    GenericForTokenClassification,
)


class MistralForSequenceClassification(GenericForSequenceClassification):
    config_class = MistralConfig
    model_cls = MistralModel


class MistralForTokenClassification(GenericForTokenClassification):
    config_class = MistralConfig
    model_cls = MistralModel


class MistralForQuestionAnswering(GenericForQuestionAnswering):
    config_class = MistralConfig
    model_cls = MistralModel
