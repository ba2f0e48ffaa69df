"""GraniteMoeSWA (reference src/transformers/models/granitemoe_swa/modular_granitemoe_swa.py).

GraniteMoeShared's MoE (+ optional shared experts) with GraniteSWA's
per-layer sliding windows, learnable attention sinks, and per-layer rope
theta (0 => NoPE)."""

from __future__ import annotations

import copy

from ...core.loading import WeightRule
from ...ops.rope import compute_cos_sin, rope_inv_freq
from ..granite_swa.modeling_granite_swa import GraniteSWAAttention
from ..granitemoeshared.modeling_granitemoeshared import (
    GraniteMoeSharedDecoderLayer,
    GraniteMoeSharedForCausalLM,
    GraniteMoeSharedModel,
    GraniteMoeSharedModelStandalone,
)
from .configuration_granitemoe_swa import GraniteMoeSWAConfig


class GraniteMoeSWAAttention(GraniteSWAAttention):
    pass


class GraniteMoeSWADecoderLayer(GraniteMoeSharedDecoderLayer):
    attention_cls = GraniteMoeSWAAttention


class GraniteMoeSWAModel(GraniteMoeSharedModel):
    decoder_layer_cls = GraniteMoeSWADecoderLayer

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self._theta_tables = {}
        for theta in sorted({t for t in config.layer_rope_theta if t}):
            cfg = copy.copy(config)
            cfg.rope_theta = theta
            self._theta_tables[theta] = rope_inv_freq(cfg)

    def compute_rope(self, position_ids):
        return {theta: compute_cos_sin(position_ids, inv, scaling, dtype=self.dtype)
                for theta, (inv, scaling) in self._theta_tables.items()}

    def rope_for_layer(self, rope, layer_idx):
        theta = self.config.layer_rope_theta[layer_idx]
        if not theta:
            return None, None
        return rope[theta]


# v5 checkpoints store fused stacked expert tensors with the new naming
# (reference modeling_granitemoe_swa.py:80-81: gate_up_proj [E, 2I, H],
# down_proj [E, H, I]; router is a bare Parameter :65) — identical layouts to
# our input_linear/output_linear, so pure renames.
_SWA_V5_RULES = (
    WeightRule(pattern=r"block_sparse_moe\.experts\.gate_up_proj",
               rename="block_sparse_moe.input_linear.weight",
               save_pattern=r"block_sparse_moe\.input_linear\.weight",
               save_rename="block_sparse_moe.experts.gate_up_proj"),
    WeightRule(pattern=r"block_sparse_moe\.experts\.down_proj",
               rename="block_sparse_moe.output_linear.weight",
               save_pattern=r"block_sparse_moe\.output_linear\.weight",
               save_rename="block_sparse_moe.experts.down_proj"),
    WeightRule(pattern=r"block_sparse_moe\.router\.weight",
               rename="block_sparse_moe.router.layer.weight",
               save_pattern=r"block_sparse_moe\.router\.layer\.weight",
               save_rename="block_sparse_moe.router.weight"),
)


class GraniteMoeSWAForCausalLM(GraniteMoeSharedForCausalLM):
    config_class = GraniteMoeSWAConfig
    model_cls = GraniteMoeSWAModel
    _weight_rules = GraniteMoeSharedForCausalLM._weight_rules + _SWA_V5_RULES


class GraniteMoeSWAModelStandalone(GraniteMoeSharedModelStandalone):
    config_class = GraniteMoeSWAConfig
    model_cls = GraniteMoeSWAModel
    _weight_rules = GraniteMoeSharedModelStandalone._weight_rules + _SWA_V5_RULES
