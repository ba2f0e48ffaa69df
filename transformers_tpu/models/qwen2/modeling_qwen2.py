"""Qwen2 decoder (reference src/transformers/models/qwen2/modeling_qwen2.py).

Llama skeleton + q/k/v biases (config-driven ``attention_qkv_bias``) and
optional sliding window above ``max_window_layers``.
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
from .configuration_qwen2 import Qwen2Config


class Qwen2MLP(LlamaMLP):
    pass


class Qwen2Attention(LlamaAttention):
    pass


class Qwen2DecoderLayer(LlamaDecoderLayer):
    attention_cls = Qwen2Attention
    mlp_cls = Qwen2MLP


class Qwen2Model(LlamaModel):
    decoder_layer_cls = Qwen2DecoderLayer


class Qwen2ForCausalLM(LlamaForCausalLM):
    config_class = Qwen2Config
    model_cls = Qwen2Model


class Qwen2ModelStandalone(LlamaModelStandalone):
    config_class = Qwen2Config
    model_cls = Qwen2Model


from ...modeling_layers import (  # noqa: E402
    GenericForQuestionAnswering,
    GenericForSequenceClassification,
    GenericForTokenClassification,
)


class Qwen2ForSequenceClassification(GenericForSequenceClassification):
    config_class = Qwen2Config
    model_cls = Qwen2Model


class Qwen2ForTokenClassification(GenericForTokenClassification):
    config_class = Qwen2Config
    model_cls = Qwen2Model


class Qwen2ForQuestionAnswering(GenericForQuestionAnswering):
    config_class = Qwen2Config
    model_cls = Qwen2Model
