"""GraniteSWA decoder (reference
src/transformers/models/granite_swa/modular_granite_swa.py): Granite's
multiplier stack plus

- per-layer sliding windows (``layer_types``, handled by the skeleton's
  ``layer_sliding_window``),
- a learnable per-head attention sink applied as
  ``sigmoid(logsumexp(logits) - sink)`` output scaling — mathematically the
  GPT-OSS extra-denominator-logit (``s_aux``), so it rides the shared
  ``sinks`` channel in ops/attention.py,
- per-layer rope theta (``layer_rope_theta``; 0 => NoPE for that layer).
"""

from __future__ import annotations

import copy

import jax.numpy as jnp

from ...ops.rope import compute_cos_sin, rope_inv_freq
from ..granite.modeling_granite import (
    GraniteAttention,
    GraniteDecoderLayer,
    GraniteForCausalLM,
    GraniteModel,
)
from ..llama.modeling_llama import LlamaModelStandalone
from .configuration_granite_swa import GraniteSWAConfig


class GraniteSWAAttention(GraniteAttention):
    """Adds the learnable per-head sink logits (reference ``self.sinks``)."""

    def init(self, rng):
        params = super().init(rng)
        params["sinks"] = jnp.zeros((self.num_heads,), self.param_dtype)
        return params

    def extra_attn_kwargs(self, params):
        return {"sinks": params["sinks"]}


class GraniteSWADecoderLayer(GraniteDecoderLayer):
    attention_cls = GraniteSWAAttention


class GraniteSWAModel(GraniteModel):
    decoder_layer_cls = GraniteSWADecoderLayer

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        # one inv_freq table per distinct non-zero theta (reference builds
        # one rotary module per unique theta; 0 => NoPE)
        self._theta_tables = {}
        for theta in sorted({t for t in config.layer_rope_theta if t}):
            cfg = copy.copy(config)
            cfg.rope_theta = theta
            self._theta_tables[theta] = rope_inv_freq(cfg)

    def compute_rope(self, position_ids):
        return {
            theta: compute_cos_sin(position_ids, inv, scaling, dtype=self.dtype)
            for theta, (inv, scaling) in self._theta_tables.items()
        }

    def rope_for_layer(self, rope, layer_idx):
        theta = self.config.layer_rope_theta[layer_idx]
        if not theta:
            return None, None  # NoPE layer
        return rope[theta]


class GraniteSWAForCausalLM(GraniteForCausalLM):
    config_class = GraniteSWAConfig
    model_cls = GraniteSWAModel


class GraniteSWAModelStandalone(LlamaModelStandalone):
    config_class = GraniteSWAConfig
    model_cls = GraniteSWAModel
