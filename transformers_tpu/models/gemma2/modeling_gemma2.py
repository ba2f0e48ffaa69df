"""Gemma2 decoder (reference src/transformers/models/gemma2/modeling_gemma2.py).

Gemma deltas plus:
- sandwich norms: pre/post feedforward layernorms and post-attention norm
  applied to the branch output before the residual add (Gemma2DecoderLayer),
- attention logit softcapping (tanh) and final logit softcapping,
- query scale from ``query_pre_attn_scalar``,
- alternating sliding/full attention layers via ``layer_types``.
"""

from __future__ import annotations

from ...core.module import RMSNorm
from ..gemma.modeling_gemma import GemmaAttention, GemmaMLP
from ..llama.modeling_llama import (
    LlamaDecoderLayer,
    LlamaForCausalLM,
    LlamaModel,
    LlamaModelStandalone,
)
from .configuration_gemma2 import Gemma2Config


class Gemma2MLP(GemmaMLP):
    pass


class Gemma2Attention(GemmaAttention):
    pass


class Gemma2DecoderLayer(LlamaDecoderLayer):
    attention_cls = Gemma2Attention
    mlp_cls = Gemma2MLP

    @staticmethod
    def make_norm(config, **kw):
        return RMSNorm(config.hidden_size, config.rms_norm_eps, scale_offset=1.0, **kw)

    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.pre_feedforward_layernorm = self.make_norm(config, **kw)
        self.post_feedforward_layernorm = self.make_norm(config, **kw)

    def __call__(self, params, hidden, cos, sin, attn_args, cache, cache_position):
        residual = hidden
        h = self.input_layernorm(params["input_layernorm"], hidden)
        h, cache = self.self_attn(params["self_attn"], h, cos, sin, attn_args, cache, cache_position)
        h = self.post_attention_layernorm(params["post_attention_layernorm"], h)
        hidden = residual + h
        residual = hidden
        h = self.pre_feedforward_layernorm(params["pre_feedforward_layernorm"], hidden)
        h = self.mlp(params["mlp"], h)
        h = self.post_feedforward_layernorm(params["post_feedforward_layernorm"], h)
        hidden = residual + h
        return hidden, cache


class Gemma2Model(LlamaModel):
    decoder_layer_cls = Gemma2DecoderLayer
    scale_embeddings = True


class Gemma2ForCausalLM(LlamaForCausalLM):
    config_class = Gemma2Config
    model_cls = Gemma2Model


class Gemma2ModelStandalone(LlamaModelStandalone):
    config_class = Gemma2Config
    model_cls = Gemma2Model
