"""dots1 decoder (reference src/transformers/models/dots1/modular_dots1.py).

Qwen3 attention (per-head q/k RMSNorm) + DeepseekV3 MoE layers: the first
``first_k_dense_replace`` layers are dense MLPs, the rest sigmoid-group
routed experts plus shared experts.
"""

from __future__ import annotations

from ..deepseek_v3.modeling_deepseek_v3 import DeepseekV3MLP, DeepseekV3MoE
from ..llama.modeling_llama import (
    LlamaDecoderLayer,
    LlamaForCausalLM,
    LlamaModel,
    LlamaModelStandalone,
)
from ..qwen3.modeling_qwen3 import Qwen3Attention
from .configuration_dots1 import Dots1Config


class Dots1DecoderLayer(LlamaDecoderLayer):
    attention_cls = Qwen3Attention

    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        if layer_idx >= config.first_k_dense_replace:
            self.mlp = DeepseekV3MoE(config, **kw)
        else:
            self.mlp = DeepseekV3MLP(config, **kw)


class Dots1Model(LlamaModel):
    decoder_layer_cls = Dots1DecoderLayer


class Dots1ForCausalLM(LlamaForCausalLM):
    config_class = Dots1Config
    model_cls = Dots1Model


class Dots1ModelStandalone(LlamaModelStandalone):
    config_class = Dots1Config
    model_cls = Dots1Model
