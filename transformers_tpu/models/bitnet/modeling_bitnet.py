"""BitNet b1.58 decoder (reference src/transformers/models/bitnet/modular_bitnet.py).

Llama skeleton + sub-layer RMSNorms: ``attn_sub_norm`` on the attention
output before o_proj, ``ffn_sub_norm`` on the gated activation before
down_proj (relu^2 gate). The ternary weight quantization lives in the
checkpoint/quantizer tier, not the architecture.
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
from .configuration_bitnet import BitNetConfig


class BitNetMLP(LlamaMLP):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.ffn_sub_norm = RMSNorm(config.intermediate_size, config.rms_norm_eps,
                                    dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, x):
        h = self.act_fn(self.gate_proj(params["gate_proj"], x)) * self.up_proj(params["up_proj"], x)
        h = self.ffn_sub_norm(params["ffn_sub_norm"], h)
        return self.down_proj(params["down_proj"], h)


class BitNetAttention(LlamaAttention):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        self.attn_sub_norm = RMSNorm(config.hidden_size, config.rms_norm_eps,
                                     dtype=dtype, param_dtype=param_dtype)

    def project_out(self, params, out):
        return self.o_proj(params["o_proj"], self.attn_sub_norm(params["attn_sub_norm"], out))


class BitNetDecoderLayer(LlamaDecoderLayer):
    attention_cls = BitNetAttention
    mlp_cls = BitNetMLP


class BitNetModel(LlamaModel):
    decoder_layer_cls = BitNetDecoderLayer


class BitNetForCausalLM(LlamaForCausalLM):
    config_class = BitNetConfig
    model_cls = BitNetModel


class BitNetModelStandalone(LlamaModelStandalone):
    config_class = BitNetConfig
    model_cls = BitNetModel
