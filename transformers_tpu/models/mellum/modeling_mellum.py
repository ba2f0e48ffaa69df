"""Mellum decoder (reference models/mellum/modular_mellum.py): Qwen3-MoE
attention (per-head qk RMSNorm) under Laguna's per-layer-type rope tables;
MLP layers selectable dense/sparse per layer; sliding windows follow
layer_types."""

from __future__ import annotations

from ...core.module import Module
from ..laguna.modeling_laguna import LagunaModel, _TypeCfg
from ..llama.modeling_llama import (
    LlamaDecoderLayer,
    LlamaForCausalLM,
    LlamaMLP,
    LlamaModel,
    LlamaModelStandalone,
)
from ..qwen3.modeling_qwen3 import Qwen3Attention
from ..qwen3_moe.modeling_qwen3_moe import Qwen3MoeSparseMoeBlock
from .configuration_mellum import MellumConfig


class MellumDecoderLayer(LlamaDecoderLayer):
    attention_cls = Qwen3Attention

    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        Module.__init__(self, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.input_layernorm = self.make_norm(config, **kw)
        self.self_attn = self.attention_cls(config, layer_idx, **kw)
        self.post_attention_layernorm = self.make_norm(config, **kw)
        if config.mlp_layer_types[layer_idx] == "sparse":
            self.mlp = Qwen3MoeSparseMoeBlock(config, **kw)
        else:
            self.mlp = LlamaMLP(config, **kw)


class MellumModel(LlamaModel):
    decoder_layer_cls = MellumDecoderLayer

    compute_rope = LagunaModel.compute_rope
    rope_for_layer = LagunaModel.rope_for_layer

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        from ...ops.rope import _default_inv_freq

        self._type_inv_freq = {
            t: _default_inv_freq(_TypeCfg(config, p))
            for t, p in config.rope_parameters.items()}


class MellumForCausalLM(LlamaForCausalLM):
    config_class = MellumConfig
    model_cls = MellumModel


class MellumModelStandalone(LlamaModelStandalone):
    config_class = MellumConfig
    model_cls = MellumModel
