"""Qwen3 decoder (reference src/transformers/models/qwen3/modeling_qwen3.py).

Llama skeleton + per-head RMSNorm on q/k before RoPE (Qwen3Attention
q_norm/k_norm in the reference).
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
from .configuration_qwen3 import Qwen3Config


class Qwen3MLP(LlamaMLP):
    pass


class Qwen3Attention(LlamaAttention):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        # Applied over the head_dim axis of [B, S, H, D] — broadcasting makes
        # the base-class hook call correct as-is.
        self.q_norm = RMSNorm(self.head_dim, config.rms_norm_eps, dtype=dtype, param_dtype=param_dtype)
        self.k_norm = RMSNorm(self.head_dim, config.rms_norm_eps, dtype=dtype, param_dtype=param_dtype)


class Qwen3DecoderLayer(LlamaDecoderLayer):
    attention_cls = Qwen3Attention
    mlp_cls = Qwen3MLP


class Qwen3Model(LlamaModel):
    decoder_layer_cls = Qwen3DecoderLayer


class Qwen3ForCausalLM(LlamaForCausalLM):
    config_class = Qwen3Config
    model_cls = Qwen3Model


class Qwen3ModelStandalone(LlamaModelStandalone):
    config_class = Qwen3Config
    model_cls = Qwen3Model
