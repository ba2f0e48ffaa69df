"""Laguna decoder (reference models/laguna/modular_laguna.py).

Hybrid sliding/full attention (3:1) with per-layer-TYPE rope tables — full
layers at theta 500k over HALF the head dim (partial rotary 0.5), sliding
layers at theta 10k over the full dim — per-layer head-count overrides,
per-head qk RMSNorm, and a softplus output gate (per-head or per-element).
MLP layers alternate dense/sparse: the sparse block is a sigmoid-routed
(e-score-bias, tanh-softcapped) expert bank with a shared expert and a
routed-output scaling factor.
"""

from __future__ import annotations

import copy

import jax
import jax.numpy as jnp
from ...core.module import Linear, Module, RMSNorm, normal_init
from ...ops.moe import get_experts_fn
from ...ops.rope import compute_cos_sin
from ..llama.modeling_llama import (
    LlamaAttention,
    LlamaDecoderLayer,
    LlamaForCausalLM,
    LlamaMLP,
    LlamaModel,
    LlamaModelStandalone,
)
from ...ops.activations import get_activation
from ..qwen2_moe.modeling_qwen2_moe import Qwen2MoeMLP
from .configuration_laguna import LagunaConfig


class LagunaAttention(LlamaAttention):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        heads = (config.num_attention_heads_per_layer[layer_idx]
                 if config.num_attention_heads_per_layer else
                 config.num_attention_heads)
        if heads != config.num_attention_heads:
            config = copy.copy(config)
            config.num_attention_heads = heads
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.q_norm = RMSNorm(self.head_dim, config.rms_norm_eps, **kw)
        self.k_norm = RMSNorm(self.head_dim, config.rms_norm_eps, **kw)
        # softplus output gate (reference LagunaAttention.forward:337-344)
        self.gate_per_head = config.gating is True or config.gating == "per-head"
        g_dim = self.num_heads if self.gate_per_head else self.num_heads * self.head_dim
        self.g_proj = Linear(config.hidden_size, g_dim, False, dtype=dtype,
                             param_dtype=param_dtype,
                             kernel_init=normal_init(config.initializer_range))

    def project_qkv(self, params, hidden):
        self._gate_in = hidden
        return super().project_qkv(params, hidden)

    def project_out(self, params, out):
        b, s, _ = out.shape
        gate = jax.nn.softplus(
            self.g_proj(params["g_proj"], self._gate_in).astype(jnp.float32)
        ).astype(out.dtype)
        if self.gate_per_head:
            out = (out.reshape(b, s, self.num_heads, self.head_dim)
                   * gate[..., None]).reshape(b, s, -1)
        else:
            out = out * gate
        return self.o_proj(params["o_proj"], out)


class LagunaTopKRouter(Module):
    """Sigmoid routing with e-score correction bias and optional tanh logit
    softcapping (reference LagunaTopKRouter:224-250)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.top_k = config.num_experts_per_tok
        self.num_experts = config.num_experts
        self.softcap = config.moe_router_logit_softcapping
        self.gate = Linear(config.hidden_size, config.num_experts, False,
                           dtype=dtype, param_dtype=param_dtype,
                           kernel_init=normal_init(config.initializer_range))

    def init(self, rng):
        params = super().init(rng)
        params["e_score_correction_bias"] = jnp.zeros(
            (self.num_experts,), jnp.float32)
        return params

    def __call__(self, params, x):
        logits = self.gate(params["gate"], x).astype(jnp.float32)
        if self.softcap and self.softcap > 0.0:
            logits = jnp.tanh(logits / self.softcap) * self.softcap
        scores = jax.nn.sigmoid(logits)
        biased = scores + params["e_score_correction_bias"]
        _, idx = jax.lax.top_k(biased, self.top_k)
        weights = jnp.take_along_axis(scores, idx, axis=-1)
        weights = weights / weights.sum(-1, keepdims=True)
        return logits, weights.astype(x.dtype), idx


class LagunaSparseMoeBlock(Module):
    """Routed experts x routed_scaling + shared expert (reference
    LagunaSparseMoeBlock:253-272)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.num_experts = config.num_experts
        self.routed_scaling_factor = config.moe_routed_scaling_factor
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.gate = LagunaTopKRouter(config, **kw)
        self.experts = [Qwen2MoeMLP(config, config.moe_intermediate_size, **kw)
                        for _ in range(config.num_experts)]
        self.shared_experts = Qwen2MoeMLP(
            config, config.shared_expert_intermediate_size, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, hidden):
        b, s, h = hidden.shape
        x = hidden.reshape(b * s, h)
        shared = self.shared_experts(params["shared_experts"], x)
        _, weights, idx = self.gate(params["gate"], x)
        w_gate = jnp.stack([params["experts"][str(e)]["gate_proj"]["weight"]
                            for e in range(self.num_experts)])
        w_up = jnp.stack([params["experts"][str(e)]["up_proj"]["weight"]
                          for e in range(self.num_experts)])
        w_down = jnp.stack([params["experts"][str(e)]["down_proj"]["weight"]
                            for e in range(self.num_experts)])
        experts_fn = get_experts_fn(getattr(self.config, "experts_implementation", None))
        out = experts_fn(x.astype(self.dtype), w_gate.astype(self.dtype),
                         w_up.astype(self.dtype), w_down.astype(self.dtype),
                         weights, idx, self.act)
        out = out * self.routed_scaling_factor + shared
        return out.reshape(b, s, h).astype(hidden.dtype)


class LagunaDecoderLayer(LlamaDecoderLayer):
    attention_cls = LagunaAttention

    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        Module.__init__(self, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.input_layernorm = self.make_norm(config, **kw)
        self.self_attn = self.attention_cls(config, layer_idx, **kw)
        self.post_attention_layernorm = self.make_norm(config, **kw)
        if config.mlp_layer_types[layer_idx] == "sparse":
            self.mlp = LagunaSparseMoeBlock(config, **kw)
        else:
            self.mlp = LlamaMLP(config, **kw)


class _TypeCfg:
    """Stub carrying one layer-type's rope params for the inv_freq builder."""

    def __init__(self, config, params):
        self.hidden_size = config.hidden_size
        self.num_attention_heads = config.num_attention_heads
        self.head_dim = config.head_dim
        self.rope_theta = params["rope_theta"]
        self.partial_rotary_factor = params.get("partial_rotary_factor", 1.0)
        self.rope_scaling = None


class LagunaModel(LlamaModel):
    decoder_layer_cls = LagunaDecoderLayer

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        from ...ops.rope import _default_inv_freq

        self._type_inv_freq = {
            t: _default_inv_freq(_TypeCfg(config, p))
            for t, p in config.rope_parameters.items()}

    def compute_rope(self, position_ids):
        return {t: compute_cos_sin(position_ids, f, 1.0, dtype=self.dtype)
                for t, f in self._type_inv_freq.items()}

    def rope_for_layer(self, rope, layer_idx):
        return rope[self.config.layer_types[layer_idx]]


class LagunaForCausalLM(LlamaForCausalLM):
    config_class = LagunaConfig
    model_cls = LagunaModel


class LagunaModelStandalone(LlamaModelStandalone):
    config_class = LagunaConfig
    model_cls = LagunaModel
