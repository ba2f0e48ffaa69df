"""SmolLM3 decoder (reference models/smollm3/modeling_smollm3.py):
Llama skeleton with per-layer NoPE (rope skipped on every Nth layer)."""

from __future__ import annotations

from ..llama.modeling_llama import (
    LlamaAttention,
    LlamaDecoderLayer,
    LlamaForCausalLM,
    LlamaMLP,
    LlamaModel,
    LlamaModelStandalone,
)
from .configuration_smollm3 import SmolLM3Config


class SmolLM3Attention(LlamaAttention):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        # reference: use_rope = config.no_rope_layers[layer_idx] (1 = rope)
        self.apply_rope = bool(config.no_rope_layers[layer_idx])


class SmolLM3DecoderLayer(LlamaDecoderLayer):
    attention_cls = SmolLM3Attention
    mlp_cls = LlamaMLP


class SmolLM3Model(LlamaModel):
    decoder_layer_cls = SmolLM3DecoderLayer


class SmolLM3ForCausalLM(LlamaForCausalLM):
    config_class = SmolLM3Config
    model_cls = SmolLM3Model


class SmolLM3ModelStandalone(LlamaModelStandalone):
    config_class = SmolLM3Config
    model_cls = SmolLM3Model
