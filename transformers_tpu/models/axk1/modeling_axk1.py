"""A.X-K1 decoder (reference models/axk1/modular_axk1.py): DeepSeek-V3 with
one delta — an extra RMSNorm (``post_mlp_layernorm``) on every MoE block's
output (shared + routed sum)."""

from __future__ import annotations

from ...core.module import RMSNorm
from ..deepseek_v3.modeling_deepseek_v3 import (
    DeepseekV3DecoderLayer,
    DeepseekV3ForCausalLM,
    DeepseekV3Model,
    DeepseekV3ModelStandalone,
    DeepseekV3MoE,
)
from .configuration_axk1 import AXK1Config


class AXK1MoE(DeepseekV3MoE):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.post_mlp_layernorm = RMSNorm(config.hidden_size, config.rms_norm_eps,
                                          dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, hidden):
        out = super().__call__(params, hidden)
        return self.post_mlp_layernorm(params["post_mlp_layernorm"], out)


class AXK1DecoderLayer(DeepseekV3DecoderLayer):
    moe_cls = AXK1MoE


class AXK1Model(DeepseekV3Model):
    decoder_layer_cls = AXK1DecoderLayer


class AXK1ForCausalLM(DeepseekV3ForCausalLM):
    config_class = AXK1Config
    model_cls = AXK1Model


class AXK1ModelStandalone(DeepseekV3ModelStandalone):
    config_class = AXK1Config
    model_cls = AXK1Model
