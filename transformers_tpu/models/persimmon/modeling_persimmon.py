"""Persimmon decoder (reference src/transformers/models/persimmon/modeling_persimmon.py).

Llama skeleton with:
- fused ``query_key_value`` projection in the per-head-interleaved
  ``[H, 3, D]`` layout (reference ``_split_heads`` :228-242), output proj
  named ``dense``, both biased;
- optional full LayerNorm on q/k heads BEFORE rope (``qk_layernorm``,
  reference :215-223 — elementwise-affine LayerNorm over head_dim);
- plain LayerNorm norms (eps ``layer_norm_eps``), final norm named
  ``final_layernorm``;
- partial rotary (standard rotate-half layout, leading dims);
- up/down MLP named ``dense_h_to_4h``/``dense_4h_to_h`` with squared ReLU
  (reference :151-160).
"""

from __future__ import annotations

from ...core.loading import WeightRule
from ...core.module import LayerNorm, Linear, Module, normal_init
from ...ops.activations import get_activation
from ..llama.modeling_llama import (
    LlamaAttention,
    LlamaDecoderLayer,
    LlamaForCausalLM,
    LlamaModel,
    LlamaModelStandalone,
)
from .configuration_persimmon import PersimmonConfig


class PersimmonMLP(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.dense_h_to_4h = Linear(config.hidden_size, config.intermediate_size, True, **kw)
        self.dense_4h_to_h = Linear(config.intermediate_size, config.hidden_size, True, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, x):
        return self.dense_4h_to_h(params["dense_4h_to_h"],
                                  self.act(self.dense_h_to_4h(params["dense_h_to_4h"], x)))


class PersimmonAttention(LlamaAttention):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        if config.qk_layernorm:
            # LayerNorm over head_dim, applied per head before rope
            # (reference modeling_persimmon.py:262-265).
            kw = dict(dtype=dtype, param_dtype=param_dtype)
            self.q_norm = LayerNorm(self.head_dim, config.layer_norm_eps, **kw)
            self.k_norm = LayerNorm(self.head_dim, config.layer_norm_eps, **kw)

    def build_projections(self, config, qkv_bias, o_bias, kw):
        self.query_key_value = Linear(config.hidden_size, 3 * config.hidden_size, True, **kw)
        self.dense = Linear(self.num_heads * self.head_dim, config.hidden_size, True, **kw)

    def project_qkv(self, params, hidden):
        b, s, _ = hidden.shape
        fused = self.query_key_value(params["query_key_value"], hidden)
        qkv = fused.reshape(b, s, self.num_heads, 3, self.head_dim)
        return qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]

    def project_out(self, params, out):
        return self.dense(params["dense"], out)


class PersimmonDecoderLayer(LlamaDecoderLayer):
    attention_cls = PersimmonAttention
    mlp_cls = PersimmonMLP

    @staticmethod
    def make_norm(config, **kw):
        return LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)


class PersimmonModel(LlamaModel):
    decoder_layer_cls = PersimmonDecoderLayer
    norm_name = "final_layernorm"


# checkpoint names q_layernorm/k_layernorm -> the skeleton's q_norm/k_norm hooks
PERSIMMON_WEIGHT_RULES = (
    WeightRule(pattern=r"(.*\.self_attn\.)q_layernorm(\..*)", rename=r"\1q_norm\2"),
    WeightRule(pattern=r"(.*\.self_attn\.)k_layernorm(\..*)", rename=r"\1k_norm\2"),
)


class PersimmonForCausalLM(LlamaForCausalLM):
    config_class = PersimmonConfig
    model_cls = PersimmonModel
    _weight_rules = PERSIMMON_WEIGHT_RULES


class PersimmonModelStandalone(LlamaModelStandalone):
    config_class = PersimmonConfig
    model_cls = PersimmonModel
    _weight_rules = PERSIMMON_WEIGHT_RULES
