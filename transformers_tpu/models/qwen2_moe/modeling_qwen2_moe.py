"""Qwen2-MoE decoder (reference models/qwen2_moe/modeling_qwen2_moe.py):
Qwen2 attention + sparse MoE block with a sigmoid-gated shared expert;
softmax-then-topk routing with optional renormalization."""

from __future__ import annotations

import jax
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
from ..qwen2.modeling_qwen2 import Qwen2Attention
from .configuration_qwen2_moe import Qwen2MoeConfig


class Qwen2MoeMLP(Module):
    """Gated MLP with an explicit intermediate size (experts are narrower)."""

    def __init__(self, config, intermediate_size, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.gate_proj = Linear(config.hidden_size, intermediate_size, False, **kw)
        self.up_proj = Linear(config.hidden_size, intermediate_size, False, **kw)
        self.down_proj = Linear(intermediate_size, config.hidden_size, False, **kw)
        self.act_fn = get_activation(config.hidden_act)

    def __call__(self, params, x):
        return self.down_proj(
            params["down_proj"],
            self.act_fn(self.gate_proj(params["gate_proj"], x)) * self.up_proj(params["up_proj"], x))


class Qwen2MoeSparseMoeBlock(Module):
    def __init__(self, config: Qwen2MoeConfig, *, dtype, param_dtype):
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
        self.shared_expert = Qwen2MoeMLP(config, config.shared_expert_intermediate_size,
                                         dtype=dtype, param_dtype=param_dtype)
        self.shared_expert_gate = Linear(config.hidden_size, 1, False, **kw)
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
        shared = self.shared_expert(params["shared_expert"], x)
        gate = jax.nn.sigmoid(self.shared_expert_gate(params["shared_expert_gate"], x))
        out = out + gate * shared
        return out.reshape(b, s, h).astype(hidden.dtype)


class Qwen2MoeDecoderLayer(LlamaDecoderLayer):
    attention_cls = Qwen2Attention
    mlp_cls = LlamaMLP  # replaced below per layer

    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        del self._children["mlp"]
        object.__delattr__(self, "mlp")
        sparse = (layer_idx not in config.mlp_only_layers) and (
            config.num_experts > 0 and (layer_idx + 1) % config.decoder_sparse_step == 0)
        if sparse:
            self.mlp = Qwen2MoeSparseMoeBlock(config, dtype=dtype, param_dtype=param_dtype)
        else:
            self.mlp = Qwen2MoeMLP(config, config.intermediate_size,
                                   dtype=dtype, param_dtype=param_dtype)


class Qwen2MoeModel(LlamaModel):
    decoder_layer_cls = Qwen2MoeDecoderLayer


class Qwen2MoeForCausalLM(LlamaForCausalLM):
    config_class = Qwen2MoeConfig
    model_cls = Qwen2MoeModel


class Qwen2MoeModelStandalone(LlamaModelStandalone):
    config_class = Qwen2MoeConfig
    model_cls = Qwen2MoeModel
