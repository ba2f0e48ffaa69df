"""OLMoE decoder (reference src/transformers/models/olmoe/modeling_olmoe.py).

Llama skeleton with FULL-WIDTH RMS norms on the q/k projections applied
before the head reshape (:233-250, unlike Qwen3's per-head norms), optional
``clip_qkv``, and a top-8 MoE MLP (softmax-then-top-k router named
``mlp.gate``, per-expert gated MLPs).
"""

from __future__ import annotations

import jax.numpy as jnp

from ...core.module import Linear, Module, RMSNorm, normal_init
from ...ops.activations import get_activation
from ...ops.moe import get_experts_fn, topk_routing
from ..llama.modeling_llama import (
    LlamaAttention,
    LlamaDecoderLayer,
    LlamaForCausalLM,
    LlamaModel,
    LlamaModelStandalone,
)
from .configuration_olmoe import OlmoeConfig


class OlmoeAttention(LlamaAttention):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        # full-width norms applied pre-reshape — kept OUT of the skeleton's
        # per-head q_norm/k_norm hooks
        self.full_q_norm = RMSNorm(config.hidden_size, config.rms_norm_eps, **kw)
        self.full_k_norm = RMSNorm(self.num_kv_heads * self.head_dim, config.rms_norm_eps, **kw)

    def param_load_transform(self, name, arr):
        return arr

    def project_qkv(self, params, hidden):
        b, s, _ = hidden.shape
        q = self.q_proj(params["q_proj"], hidden)
        k = self.k_proj(params["k_proj"], hidden)
        v = self.v_proj(params["v_proj"], hidden)
        clip = getattr(self.config, "clip_qkv", None)
        if clip is not None:
            q = jnp.clip(q, -clip, clip)
            k = jnp.clip(k, -clip, clip)
            v = jnp.clip(v, -clip, clip)
        q = self.full_q_norm(params["full_q_norm"], q)
        k = self.full_k_norm(params["full_k_norm"], k)
        return (q.reshape(b, s, self.num_heads, self.head_dim),
                k.reshape(b, s, self.num_kv_heads, self.head_dim),
                v.reshape(b, s, self.num_kv_heads, self.head_dim))


# checkpoint names q_norm/k_norm map to the full-width modules
from ...core.loading import WeightRule  # noqa: E402

OLMOE_WEIGHT_RULES = (
    WeightRule(pattern=r"(.*\.self_attn\.)q_norm(\..*)", rename=r"\1full_q_norm\2"),
    WeightRule(pattern=r"(.*\.self_attn\.)k_norm(\..*)", rename=r"\1full_k_norm\2"),
)


class OlmoeExpertMLP(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.gate_proj = Linear(config.hidden_size, config.intermediate_size, False, **kw)
        self.up_proj = Linear(config.hidden_size, config.intermediate_size, False, **kw)
        self.down_proj = Linear(config.intermediate_size, config.hidden_size, False, **kw)


class OlmoeSparseMoeBlock(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.top_k = config.num_experts_per_tok
        self.num_experts = config.num_experts
        self.norm_topk_prob = config.norm_topk_prob
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.gate = Linear(config.hidden_size, config.num_experts, False, **kw)
        self.experts = [OlmoeExpertMLP(config, dtype=dtype, param_dtype=param_dtype)
                        for _ in range(config.num_experts)]
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, hidden):
        b, s, h = hidden.shape
        x = hidden.reshape(b * s, h)
        router_logits = self.gate(params["gate"], x)
        weights, idx = topk_routing(router_logits, self.top_k,
                                    renormalize=self.norm_topk_prob)
        wg = jnp.stack([params["experts"][str(e)]["gate_proj"]["weight"]
                        for e in range(self.num_experts)])
        wu = jnp.stack([params["experts"][str(e)]["up_proj"]["weight"]
                        for e in range(self.num_experts)])
        wd = jnp.stack([params["experts"][str(e)]["down_proj"]["weight"]
                        for e in range(self.num_experts)])
        experts_fn = get_experts_fn(getattr(self.config, "experts_implementation", None))
        out = experts_fn(x.astype(self.dtype), wg.astype(self.dtype), wu.astype(self.dtype),
                         wd.astype(self.dtype), weights, idx, self.act)
        return out.reshape(b, s, h).astype(hidden.dtype)


class OlmoeDecoderLayer(LlamaDecoderLayer):
    attention_cls = OlmoeAttention

    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        del self._children["mlp"]
        object.__delattr__(self, "mlp")
        self.mlp = OlmoeSparseMoeBlock(config, dtype=dtype, param_dtype=param_dtype)


class OlmoeModel(LlamaModel):
    decoder_layer_cls = OlmoeDecoderLayer


class OlmoeForCausalLM(LlamaForCausalLM):
    config_class = OlmoeConfig
    model_cls = OlmoeModel
    _weight_rules = OLMOE_WEIGHT_RULES


class OlmoeModelStandalone(LlamaModelStandalone):
    config_class = OlmoeConfig
    model_cls = OlmoeModel
    _weight_rules = OLMOE_WEIGHT_RULES
