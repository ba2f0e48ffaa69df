"""Phi-3 decoder (reference src/transformers/models/phi3/modeling_phi3.py).

Llama skeleton with fused checkpoint projections:
- ``self_attn.qkv_proj`` packs [q | k | v] along the output dim
  (Phi3Attention in the reference),
- ``mlp.gate_up_proj`` packs [gate | up] (Phi3MLP),
plus LongRoPE scaling handled by the shared rope library.
"""

from __future__ import annotations

from ...core.module import Linear, Module, normal_init
from ...ops.activations import get_activation
from ..llama.modeling_llama import (
    LlamaAttention,
    LlamaDecoderLayer,
    LlamaForCausalLM,
    LlamaModel,
    LlamaModelStandalone,
)
from .configuration_phi3 import Phi3Config


class Phi3MLP(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.gate_up_proj = Linear(config.hidden_size, 2 * config.intermediate_size, False, **kw)
        self.down_proj = Linear(config.intermediate_size, config.hidden_size, False, **kw)
        self.act_fn = get_activation(config.hidden_act)
        self.intermediate_size = config.intermediate_size

    def __call__(self, params, x):
        gate_up = self.gate_up_proj(params["gate_up_proj"], x)
        gate = gate_up[..., : self.intermediate_size]
        up = gate_up[..., self.intermediate_size :]
        return self.down_proj(params["down_proj"], self.act_fn(gate) * up)


class Phi3Attention(LlamaAttention):
    def build_projections(self, config, qkv_bias, o_bias, kw):
        op_size = (self.num_heads + 2 * self.num_kv_heads) * self.head_dim
        self.qkv_proj = Linear(config.hidden_size, op_size, qkv_bias, **kw)
        self.o_proj = Linear(self.num_heads * self.head_dim, config.hidden_size, o_bias, **kw)

    def project_qkv(self, params, hidden):
        b, s, _ = hidden.shape
        qkv = self.qkv_proj(params["qkv_proj"], hidden)
        q_size = self.num_heads * self.head_dim
        kv_size = self.num_kv_heads * self.head_dim
        q = qkv[..., :q_size].reshape(b, s, self.num_heads, self.head_dim)
        k = qkv[..., q_size : q_size + kv_size].reshape(b, s, self.num_kv_heads, self.head_dim)
        v = qkv[..., q_size + kv_size :].reshape(b, s, self.num_kv_heads, self.head_dim)
        return q, k, v


class Phi3DecoderLayer(LlamaDecoderLayer):
    attention_cls = Phi3Attention
    mlp_cls = Phi3MLP


class Phi3Model(LlamaModel):
    decoder_layer_cls = Phi3DecoderLayer


class Phi3ForCausalLM(LlamaForCausalLM):
    config_class = Phi3Config
    model_cls = Phi3Model


class Phi3ModelStandalone(LlamaModelStandalone):
    config_class = Phi3Config
    model_cls = Phi3Model
