"""Gemma decoder (reference src/transformers/models/gemma/modeling_gemma.py).

Llama skeleton with three deltas:
- embeddings scaled by sqrt(hidden_size) cast to the compute dtype
  (GemmaModel.forward ``normalizer`` in the reference),
- zero-centered RMSNorm: output * (1 + weight) (GemmaRMSNorm),
- gelu_pytorch_tanh MLP via config ``hidden_activation``.
"""

from __future__ import annotations

from ...core.module import RMSNorm
from ..llama.modeling_llama import (
    LlamaAttention,
    LlamaDecoderLayer,
    LlamaForCausalLM,
    LlamaMLP,
    LlamaModel,
    LlamaModelStandalone,
)
from .configuration_gemma import GemmaConfig


class GemmaMLP(LlamaMLP):
    pass


class GemmaAttention(LlamaAttention):
    pass


class GemmaDecoderLayer(LlamaDecoderLayer):
    attention_cls = GemmaAttention
    mlp_cls = GemmaMLP

    @staticmethod
    def make_norm(config, **kw):
        return RMSNorm(config.hidden_size, config.rms_norm_eps, scale_offset=1.0, **kw)


class GemmaModel(LlamaModel):
    decoder_layer_cls = GemmaDecoderLayer
    scale_embeddings = True


class GemmaForCausalLM(LlamaForCausalLM):
    config_class = GemmaConfig
    model_cls = GemmaModel


class GemmaModelStandalone(LlamaModelStandalone):
    config_class = GemmaConfig
    model_cls = GemmaModel
