"""HyperCLOVAX (reference src/transformers/models/hyperclovax/modular_hyperclovax.py).

Granite MuP skeleton + Peri-Layer Normalization (extra RMSNorm after each
sub-layer output, reference :117) and logits MULTIPLIED by logits_scaling
(Granite divides, reference :219)."""

from __future__ import annotations

import jax.numpy as jnp

from ...core.module import RMSNorm
from ...modeling_layers import (
    GenericForQuestionAnswering,
    GenericForSequenceClassification,
    GenericForTokenClassification,
)
from ..granite.modeling_granite import GraniteAttention, GraniteModel
from ..llama.modeling_llama import (
    DECODER_TP_PLAN,
    LlamaDecoderLayer,
    LlamaForCausalLM,
    LlamaMLP,
    LlamaModelStandalone,
)
from .configuration_hyperclovax import HyperCLOVAXConfig


class HyperCLOVAXDecoderLayer(LlamaDecoderLayer):
    attention_cls = GraniteAttention
    mlp_cls = LlamaMLP

    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        self.residual_multiplier = config.residual_multiplier
        self.use_post_norm = config.use_post_norm
        if config.use_post_norm:
            kw = dict(dtype=dtype, param_dtype=param_dtype)
            self.post_norm1 = RMSNorm(config.hidden_size, config.rms_norm_eps, **kw)
            self.post_norm2 = RMSNorm(config.hidden_size, config.rms_norm_eps, **kw)

    def __call__(self, params, hidden, cos, sin, attn_args, cache, cache_position):
        m = jnp.asarray(self.residual_multiplier, hidden.dtype)
        residual = hidden
        h = self.input_layernorm(params["input_layernorm"], hidden)
        h, cache = self.self_attn(params["self_attn"], h, cos, sin, attn_args,
                                  cache, cache_position)
        if self.use_post_norm:
            h = self.post_norm1(params["post_norm1"], h)
        hidden = residual + h * m
        residual = hidden
        h = self.post_attention_layernorm(params["post_attention_layernorm"], hidden)
        h = self.mlp(params["mlp"], h)
        if self.use_post_norm:
            h = self.post_norm2(params["post_norm2"], h)
        return residual + h * m, cache


class HyperCLOVAXModel(GraniteModel):
    decoder_layer_cls = HyperCLOVAXDecoderLayer


class HyperCLOVAXForCausalLM(LlamaForCausalLM):
    config_class = HyperCLOVAXConfig
    model_cls = HyperCLOVAXModel
    _tp_plan = DECODER_TP_PLAN

    def compute_logits(self, params, hidden):
        # MuP: MULTIPLY (reference :219; Granite divides)
        return super().compute_logits(params, hidden) * self.config.logits_scaling


class HyperCLOVAXModelStandalone(LlamaModelStandalone):
    config_class = HyperCLOVAXConfig
    model_cls = HyperCLOVAXModel


class HyperCLOVAXForSequenceClassification(GenericForSequenceClassification):
    config_class = HyperCLOVAXConfig
    model_cls = HyperCLOVAXModel


class HyperCLOVAXForTokenClassification(GenericForTokenClassification):
    config_class = HyperCLOVAXConfig
    model_cls = HyperCLOVAXModel


class HyperCLOVAXForQuestionAnswering(GenericForQuestionAnswering):
    config_class = HyperCLOVAXConfig
    model_cls = HyperCLOVAXModel
