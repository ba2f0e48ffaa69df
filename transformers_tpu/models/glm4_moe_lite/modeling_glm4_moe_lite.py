"""GLM-4-MoE-Lite decoder (reference
src/transformers/models/glm4_moe_lite/modular_glm4_moe_lite.py): DeepSeek-V3
MLA attention (interleaved rope, q/kv low-rank projections) over the
GLM-4.5-MoE sigmoid group-limited router, with per-layer dense/sparse MLPs
(``mlp_layer_types``) and v5 STACKED expert weights
(``mlp.experts.gate_up_proj`` [E, 2I, H] / ``down_proj`` [E, H, I])."""

from __future__ import annotations

from ..deepseek_v3.modeling_deepseek_v3 import (
    DeepseekV3Attention,
    DeepseekV3ForCausalLM,
    DeepseekV3MoE,
)
from ..llama.modeling_llama import (
    LlamaDecoderLayer,
    LlamaModel,
    LlamaModelStandalone,
)
from .configuration_glm4_moe_lite import Glm4MoeLiteConfig

# router + per-expert weights + shared experts: identical semantics and hub
# key layout (mlp.experts.N.{gate,up,down}_proj) to DeepSeek-V3
Glm4MoeLiteMoE = DeepseekV3MoE


class Glm4MoeLiteDecoderLayer(LlamaDecoderLayer):
    attention_cls = DeepseekV3Attention

    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        if config.mlp_layer_types[layer_idx] == "sparse":
            del self._children["mlp"]
            object.__delattr__(self, "mlp")
            self.mlp = Glm4MoeLiteMoE(config, dtype=dtype, param_dtype=param_dtype)


class Glm4MoeLiteModel(LlamaModel):
    decoder_layer_cls = Glm4MoeLiteDecoderLayer


class Glm4MoeLiteForCausalLM(DeepseekV3ForCausalLM):
    config_class = Glm4MoeLiteConfig
    model_cls = Glm4MoeLiteModel


class Glm4MoeLiteModelStandalone(LlamaModelStandalone):
    config_class = Glm4MoeLiteConfig
    model_cls = Glm4MoeLiteModel
