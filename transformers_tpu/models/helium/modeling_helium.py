"""Helium decoder (reference src/transformers/models/helium/modeling_helium.py).

Llama skeleton with GLM-style INTERLEAVED rotary over the full head width
(:174-209 — cos/sin halved then repeat_interleaved) and a bias-free o_proj
sized hidden->hidden regardless of head_dim (:234).
"""

from __future__ import annotations

from ...core.module import Linear, normal_init
from ...ops.rope import apply_rotary_pos_emb_interleaved, compute_cos_sin_interleaved
from ..llama.modeling_llama import (
    LlamaAttention,
    LlamaDecoderLayer,
    LlamaForCausalLM,
    LlamaModel,
    LlamaModelStandalone,
)
from .configuration_helium import HeliumConfig


class HeliumAttention(LlamaAttention):
    rope_fn = staticmethod(apply_rotary_pos_emb_interleaved)

    def build_projections(self, config, qkv_bias, o_bias, kw):
        self.q_proj = Linear(config.hidden_size, self.num_heads * self.head_dim, qkv_bias, **kw)
        self.k_proj = Linear(config.hidden_size, self.num_kv_heads * self.head_dim, qkv_bias, **kw)
        self.v_proj = Linear(config.hidden_size, self.num_kv_heads * self.head_dim, qkv_bias, **kw)
        # o_proj maps hidden -> hidden (reference :234)
        self.o_proj = Linear(config.hidden_size, config.hidden_size, False, **kw)


class HeliumDecoderLayer(LlamaDecoderLayer):
    attention_cls = HeliumAttention


class HeliumModel(LlamaModel):
    decoder_layer_cls = HeliumDecoderLayer

    def compute_rope(self, position_ids):
        return compute_cos_sin_interleaved(position_ids, self.inv_freq,
                                           self.attention_scaling, dtype=self.dtype)


class HeliumForCausalLM(LlamaForCausalLM):
    config_class = HeliumConfig
    model_cls = HeliumModel


class HeliumModelStandalone(LlamaModelStandalone):
    config_class = HeliumConfig
    model_cls = HeliumModel
