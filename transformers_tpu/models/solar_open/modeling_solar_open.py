"""Solar-Open decoder (reference
src/transformers/models/solar_open/modular_solar_open.py): the GLM-4.5-MoE
stack with full rotary (partial factor 1.0), no qk-norm, and the sigmoid
group-limited MoE (shared experts + e_score_correction_bias router) on EVERY
layer (the reference removes ``first_k_dense_replace``). Checkpoints carry
the per-expert key layout (``mlp.experts.N.gate_proj`` — v5 save-time
conversion), which is what the shared DeepseekV3MoE consumes."""

from __future__ import annotations

from ..glm4_moe.modeling_glm4_moe import (
    Glm4MoeDecoderLayer,
    Glm4MoeModel,
)
from ..llama.modeling_llama import LlamaForCausalLM, LlamaModelStandalone
from .configuration_solar_open import SolarOpenConfig


class SolarOpenDecoderLayer(Glm4MoeDecoderLayer):
    pass


class SolarOpenModel(Glm4MoeModel):
    decoder_layer_cls = SolarOpenDecoderLayer


class SolarOpenForCausalLM(LlamaForCausalLM):
    config_class = SolarOpenConfig
    model_cls = SolarOpenModel


class SolarOpenModelStandalone(LlamaModelStandalone):
    config_class = SolarOpenConfig
    model_cls = SolarOpenModel
