"""StableLM decoder (reference models/stablelm/modeling_stablelm.py):
Llama skeleton with partial rotary, LayerNorm norms, qkv-bias option, and an
optional GPT-NeoX-style parallel residual."""

from __future__ import annotations

from ...core.module import LayerNorm
from ..llama.modeling_llama import (
    LlamaAttention,
    LlamaDecoderLayer,
    LlamaForCausalLM,
    LlamaMLP,
    LlamaModel,
    LlamaModelStandalone,
)
from .configuration_stablelm import StableLmConfig


class StableLmAttention(LlamaAttention):
    pass


class StableLmMLP(LlamaMLP):
    pass


class StableLmDecoderLayer(LlamaDecoderLayer):
    attention_cls = StableLmAttention
    mlp_cls = StableLmMLP

    @staticmethod
    def make_norm(config, **kw):
        return LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)

    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        self.use_parallel_residual = config.use_parallel_residual
        if self.use_parallel_residual:
            # reference drops post_attention_layernorm in parallel mode
            del self._children["post_attention_layernorm"]
            object.__delattr__(self, "post_attention_layernorm")

    def __call__(self, params, hidden, cos, sin, attn_args, cache, cache_position):
        residual = hidden
        normed = self.input_layernorm(params["input_layernorm"], hidden)
        attn_out, cache = self.self_attn(params["self_attn"], normed, cos, sin, attn_args,
                                         cache, cache_position)
        if self.use_parallel_residual:
            # x + attn(ln1(x)) + mlp(ln1(x)) (reference StableLmDecoderLayer)
            mlp_out = self.mlp(params["mlp"], normed)
            return residual + attn_out + mlp_out, cache
        hidden = residual + attn_out
        residual = hidden
        h = self.post_attention_layernorm(params["post_attention_layernorm"], hidden)
        return residual + self.mlp(params["mlp"], h), cache


class StableLmModel(LlamaModel):
    decoder_layer_cls = StableLmDecoderLayer


class StableLmForCausalLM(LlamaForCausalLM):
    config_class = StableLmConfig
    model_cls = StableLmModel


class StableLmModelStandalone(LlamaModelStandalone):
    config_class = StableLmConfig
    model_cls = StableLmModel
