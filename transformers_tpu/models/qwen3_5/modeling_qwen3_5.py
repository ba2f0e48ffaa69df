"""Qwen3.5 decoder (reference models/qwen3_5/modular_qwen3_5.py).

Qwen3-Next hybrid stack (gated-deltanet linear attention interleaved with
full attention, zero-centered RMSNorm, partial rope) with two deltas:
- the linear-attention input projections are four separate Linears
  (in_proj_qkv / in_proj_z / in_proj_b / in_proj_a, reference :207-218)
  with q|k|v packed FLAT (key|key|value), not per-k-head as in Qwen3-Next
- the MLP is dense on every layer (no MoE; reference config drops all
  moe fields, :125-133)
"""

from __future__ import annotations

from ...core.module import Linear, normal_init
from ..qwen3_next.modeling_qwen3_next import (
    Qwen3NextDecoderLayer,
    Qwen3NextForCausalLM,
    Qwen3NextGatedDeltaNet,
    Qwen3NextModel,
    Qwen3NextModelStandalone,
)
from .configuration_qwen3_5 import Qwen3_5Config


class Qwen3_5GatedDeltaNet(Qwen3NextGatedDeltaNet):
    """Reference :207: qkv packed flat [key_dim | key_dim | value_dim] in one
    Linear; z, b, a each their own Linear."""

    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        del self.in_proj_qkvz, self.in_proj_ba
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.in_proj_qkv = Linear(self.hidden_size,
                                  self.key_dim * 2 + self.value_dim, False, **kw)
        self.in_proj_z = Linear(self.hidden_size, self.value_dim, False, **kw)
        self.in_proj_b = Linear(self.hidden_size, self.num_v_heads, False, **kw)
        self.in_proj_a = Linear(self.hidden_size, self.num_v_heads, False, **kw)

    def project_in(self, params, hidden):
        b, s, _ = hidden.shape
        mixed = self.in_proj_qkv(params["in_proj_qkv"], hidden)
        z = self.in_proj_z(params["in_proj_z"], hidden).reshape(
            b, s, self.num_v_heads, self.head_v_dim)
        b_ = self.in_proj_b(params["in_proj_b"], hidden)
        a_ = self.in_proj_a(params["in_proj_a"], hidden)
        return mixed, z, b_, a_


class Qwen3_5DecoderLayer(Qwen3NextDecoderLayer):
    deltanet_cls = Qwen3_5GatedDeltaNet


class Qwen3_5Model(Qwen3NextModel):
    decoder_layer_cls = Qwen3_5DecoderLayer


class Qwen3_5ForCausalLM(Qwen3NextForCausalLM):
    config_class = Qwen3_5Config
    model_cls = Qwen3_5Model
    # reference :645: hub checkpoints may carry MTP heads and the fused vision
    # tower; the text LM drops them on load
    _keys_to_ignore_on_load_unexpected = (r"^mtp\.", r"^model\.visual\.")


class Qwen3_5ModelStandalone(Qwen3NextModelStandalone):
    config_class = Qwen3_5Config
    model_cls = Qwen3_5Model
