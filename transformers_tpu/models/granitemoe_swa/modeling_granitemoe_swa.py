"""GraniteMoeSWA (reference src/transformers/models/granitemoe_swa/modular_granitemoe_swa.py).

GraniteMoeShared's MoE (+ optional shared experts) with GraniteSWA's
per-layer sliding windows, learnable attention sinks, and per-layer rope
theta (0 => NoPE)."""

from __future__ import annotations

import copy

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


class GraniteMoeSWAForCausalLM(GraniteMoeSharedForCausalLM):
    config_class = GraniteMoeSWAConfig
    model_cls = GraniteMoeSWAModel


class GraniteMoeSWAModelStandalone(GraniteMoeSharedModelStandalone):
    config_class = GraniteMoeSWAConfig
    model_cls = GraniteMoeSWAModel
