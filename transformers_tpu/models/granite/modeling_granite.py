"""Granite decoder, TPU-native.

Semantics match reference src/transformers/models/granite/modeling_granite.py:
llama skeleton plus four scalar multipliers — attention scale IS
``attention_multiplier`` (:124), residual adds scale by
``residual_multiplier`` (:273/:278), embeddings scale by
``embedding_multiplier`` (:397), and logits DIVIDE by ``logits_scaling``
(:497).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..llama.modeling_llama import (
    DECODER_TP_PLAN,
    LlamaAttention,
    LlamaDecoderLayer,
    LlamaForCausalLM,
    LlamaMLP,
    LlamaModel,
    LlamaModelStandalone,
)
from .configuration_granite import GraniteConfig


class GraniteAttention(LlamaAttention):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        self.scale = config.attention_multiplier


class GraniteDecoderLayer(LlamaDecoderLayer):
    attention_cls = GraniteAttention
    mlp_cls = LlamaMLP

    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        self.residual_multiplier = config.residual_multiplier

    def __call__(self, params, hidden, cos, sin, attn_args, cache, cache_position):
        m = jnp.asarray(self.residual_multiplier, hidden.dtype)
        residual = hidden
        h = self.input_layernorm(params["input_layernorm"], hidden)
        h, cache = self.self_attn(params["self_attn"], h, cos, sin, attn_args, cache, cache_position)
        hidden = residual + h * m
        residual = hidden
        h = self.post_attention_layernorm(params["post_attention_layernorm"], hidden)
        h = self.mlp(params["mlp"], h)
        return residual + h * m, cache


class GraniteModel(LlamaModel):
    decoder_layer_cls = GraniteDecoderLayer
    scale_embeddings = True

    def embed_scale(self):
        return jnp.asarray(self.config.embedding_multiplier, self.dtype)


class GraniteForCausalLM(LlamaForCausalLM):
    config_class = GraniteConfig
    model_cls = GraniteModel
    _tp_plan = DECODER_TP_PLAN

    def compute_logits(self, params, hidden):
        return super().compute_logits(params, hidden) / self.config.logits_scaling


class GraniteModelStandalone(LlamaModelStandalone):
    config_class = GraniteConfig
    model_cls = GraniteModel
