"""Qwen3-MoE decoder (reference models/qwen3_moe/modeling_qwen3_moe.py):
Qwen3 attention (per-head qk-norm) + Mixtral-style sparse block without the
shared expert (gate_proj/up_proj/down_proj expert names)."""

from __future__ import annotations

import jax.numpy as jnp

from ...core.module import Linear, Module, normal_init
from ...ops.activations import get_activation
from ...ops.moe import get_experts_fn, topk_routing
from ..llama.modeling_llama import (
    LlamaDecoderLayer,
    LlamaForCausalLM,
    LlamaMLP,
    LlamaModel,
    LlamaModelStandalone,
)
from ..qwen2_moe.modeling_qwen2_moe import Qwen2MoeMLP
from ..qwen3.modeling_qwen3 import Qwen3Attention
from .configuration_qwen3_moe import Qwen3MoeConfig


class Qwen3MoeSparseMoeBlock(Module):
    def __init__(self, config: Qwen3MoeConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.top_k = config.num_experts_per_tok
        self.num_experts = config.num_experts
        self.norm_topk_prob = config.norm_topk_prob
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.gate = Linear(config.hidden_size, config.num_experts, False, **kw)
        self.experts = [Qwen2MoeMLP(config, config.moe_intermediate_size,
                                    dtype=dtype, param_dtype=param_dtype)
                        for _ in range(config.num_experts)]
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, hidden):
        b, s, h = hidden.shape
        x = hidden.reshape(b * s, h)
        router_logits = self.gate(params["gate"], x)
        weights, idx = topk_routing(router_logits, self.top_k, renormalize=self.norm_topk_prob)
        w_gate = jnp.stack([params["experts"][str(e)]["gate_proj"]["weight"] for e in range(self.num_experts)])
        w_up = jnp.stack([params["experts"][str(e)]["up_proj"]["weight"] for e in range(self.num_experts)])
        w_down = jnp.stack([params["experts"][str(e)]["down_proj"]["weight"] for e in range(self.num_experts)])
        experts_fn = get_experts_fn(getattr(self.config, "experts_implementation", None))
        out = experts_fn(x.astype(self.dtype), w_gate.astype(self.dtype), w_up.astype(self.dtype),
                         w_down.astype(self.dtype), weights, idx, self.act)
        return out.reshape(b, s, h).astype(hidden.dtype)


class Qwen3MoeDecoderLayer(LlamaDecoderLayer):
    attention_cls = Qwen3Attention
    mlp_cls = LlamaMLP

    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        del self._children["mlp"]
        object.__delattr__(self, "mlp")
        sparse = (layer_idx not in config.mlp_only_layers) and (
            config.num_experts > 0 and (layer_idx + 1) % config.decoder_sparse_step == 0)
        if sparse:
            self.mlp = Qwen3MoeSparseMoeBlock(config, dtype=dtype, param_dtype=param_dtype)
        else:
            self.mlp = Qwen2MoeMLP(config, config.intermediate_size,
                                   dtype=dtype, param_dtype=param_dtype)


class Qwen3MoeModel(LlamaModel):
    decoder_layer_cls = Qwen3MoeDecoderLayer


class Qwen3MoeForCausalLM(LlamaForCausalLM):
    config_class = Qwen3MoeConfig
    model_cls = Qwen3MoeModel


class Qwen3MoeModelStandalone(LlamaModelStandalone):
    config_class = Qwen3MoeConfig
    model_cls = Qwen3MoeModel
