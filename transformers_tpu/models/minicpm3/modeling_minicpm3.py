"""MiniCPM3 decoder (reference
src/transformers/models/minicpm3/modular_minicpm3.py): DeepSeek-style MLA
attention with the STANDARD rotate-half rope (rope_interleave=False), plus
the MiniCPM scalar stack — embeddings × ``scale_emb``, residual branches ×
``scale_depth / sqrt(L)``, logits ÷ ``hidden_size / dim_model_base``."""

from __future__ import annotations

import math

import jax.numpy as jnp

from ..deepseek_v3.modeling_deepseek_v3 import (
    DeepseekV3Attention,
    DeepseekV3ForCausalLM,
)
from ..llama.modeling_llama import (
    LlamaDecoderLayer,
    LlamaModel,
    LlamaModelStandalone,
)
from .configuration_minicpm3 import MiniCPM3Config


class MiniCPM3DecoderLayer(LlamaDecoderLayer):
    attention_cls = DeepseekV3Attention

    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        self.residual_scale = config.scale_depth / math.sqrt(config.num_hidden_layers)

    def __call__(self, params, hidden, cos, sin, attn_args, cache, cache_position):
        m = jnp.asarray(self.residual_scale, hidden.dtype)
        residual = hidden
        h = self.input_layernorm(params["input_layernorm"], hidden)
        h, cache = self.self_attn(params["self_attn"], h, cos, sin, attn_args, cache, cache_position)
        hidden = residual + h * m
        residual = hidden
        h = self.post_attention_layernorm(params["post_attention_layernorm"], hidden)
        h = self.mlp(params["mlp"], h)
        return residual + h * m, cache


class MiniCPM3Model(LlamaModel):
    decoder_layer_cls = MiniCPM3DecoderLayer
    scale_embeddings = True

    def embed_scale(self):
        return jnp.asarray(self.config.scale_emb, self.dtype)


class MiniCPM3ForCausalLM(DeepseekV3ForCausalLM):
    config_class = MiniCPM3Config
    model_cls = MiniCPM3Model

    def compute_logits(self, params, hidden):
        return super().compute_logits(params, hidden) / self.config.logits_scaling


class MiniCPM3ModelStandalone(LlamaModelStandalone):
    config_class = MiniCPM3Config
    model_cls = MiniCPM3Model
