"""GLM-4 decoder (reference src/transformers/models/glm4/modeling_glm4.py).

GLM plus sandwich norms: ``post_self_attn_layernorm`` on the attention output
and ``post_mlp_layernorm`` on the MLP output, each applied BEFORE the residual
add (reference Glm4DecoderLayer :67-108).
"""

from __future__ import annotations

from ...core.module import RMSNorm
from ..glm.modeling_glm import GlmAttention, GlmMLP, GlmModel
from ..llama.modeling_llama import (
    LlamaDecoderLayer,
    LlamaForCausalLM,
    LlamaModelStandalone,
)
from .configuration_glm4 import Glm4Config


class Glm4DecoderLayer(LlamaDecoderLayer):
    attention_cls = GlmAttention
    mlp_cls = GlmMLP

    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.post_self_attn_layernorm = RMSNorm(config.hidden_size, config.rms_norm_eps, **kw)
        self.post_mlp_layernorm = RMSNorm(config.hidden_size, config.rms_norm_eps, **kw)

    def __call__(self, params, hidden, cos, sin, attn_args, cache, cache_position):
        residual = hidden
        h = self.input_layernorm(params["input_layernorm"], hidden)
        h, cache = self.self_attn(params["self_attn"], h, cos, sin, attn_args, cache, cache_position)
        h = self.post_self_attn_layernorm(params["post_self_attn_layernorm"], h)
        hidden = residual + h
        residual = hidden
        h = self.post_attention_layernorm(params["post_attention_layernorm"], hidden)
        h = self.mlp(params["mlp"], h)
        h = self.post_mlp_layernorm(params["post_mlp_layernorm"], h)
        hidden = residual + h
        return hidden, cache


class Glm4Model(GlmModel):
    decoder_layer_cls = Glm4DecoderLayer


class Glm4ForCausalLM(LlamaForCausalLM):
    config_class = Glm4Config
    model_cls = Glm4Model


class Glm4ModelStandalone(LlamaModelStandalone):
    config_class = Glm4Config
    model_cls = Glm4Model
