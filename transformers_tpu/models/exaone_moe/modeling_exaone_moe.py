"""EXAONE-MoE decoder (reference
src/transformers/models/exaone_moe/modular_exaone_moe.py): EXAONE-4
attention (per-head qk RMSNorm, hybrid sliding/global with global-NoPE) in a
standard PRE-norm layer (the reference builds on OlmoeDecoderLayer, not
EXAONE-4's post-norm), with DeepSeek-V3 sigmoid group-limited routing over
v5 STACKED experts + shared experts; per-layer dense/sparse via
``mlp_layer_types``."""

from __future__ import annotations

import jax.numpy as jnp

from ..deepseek_v3.modeling_deepseek_v3 import DeepseekV3MoE
from ..exaone4.modeling_exaone4 import Exaone4Attention
from ..llama.modeling_llama import (
    LlamaDecoderLayer,
    LlamaForCausalLM,
    LlamaModel,
    LlamaModelStandalone,
)
from .configuration_exaone_moe import ExaoneMoeConfig


class ExaoneMoeSparseBlock(DeepseekV3MoE):
    """DeepSeek-V3 routing/experts, but the checkpoint stores the router's
    choice bias at the BLOCK level (``mlp.e_score_correction_bias``, not
    ``mlp.gate.e_score_correction_bias`` — v5 save conversion for this
    family)."""

    def init(self, rng):
        params = super().init(rng)
        bias = params["gate"].pop("e_score_correction_bias")
        params["e_score_correction_bias"] = bias
        return params

    def __call__(self, params, hidden):
        gate = dict(params["gate"])
        gate["e_score_correction_bias"] = params["e_score_correction_bias"]
        shim = dict(params)
        shim["gate"] = gate
        return super().__call__(shim, hidden)


class ExaoneMoeDecoderLayer(LlamaDecoderLayer):
    attention_cls = Exaone4Attention

    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        if config.mlp_layer_types[layer_idx] == "sparse":
            del self._children["mlp"]
            object.__delattr__(self, "mlp")
            self.mlp = ExaoneMoeSparseBlock(config, dtype=dtype, param_dtype=param_dtype)


class ExaoneMoeModel(LlamaModel):
    decoder_layer_cls = ExaoneMoeDecoderLayer


class ExaoneMoeForCausalLM(LlamaForCausalLM):
    config_class = ExaoneMoeConfig
    model_cls = ExaoneMoeModel


class ExaoneMoeModelStandalone(LlamaModelStandalone):
    config_class = ExaoneMoeConfig
    model_cls = ExaoneMoeModel
