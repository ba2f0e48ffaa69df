"""AFMoE decoder (reference models/afmoe/modular_afmoe.py, Arcee Trinity).

- attention: per-head q/k RMSNorm, full-width sigmoid output gate
  (gate_proj), and NoPE on global layers — rope is applied ONLY on
  sliding_attention layers (reference :118-121); every Nth layer is global
- dual ("sandwich") normalization: the attention and MLP outputs are normed
  BEFORE their residual adds (input/post_attention and pre/post_mlp norms,
  reference :170-190)
- MoE: sigmoid token-choice router; a non-trainable fp32 ``expert_bias``
  shifts only the top-k choice; weights are the unbiased sigmoid scores
  renormalized to sum 1 and scaled by ``route_scale``; plus always-on shared
  experts; the first ``num_dense_layers`` layers are dense (:34-85)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.module import Module, Linear, RMSNorm, normal_init
from ..deepseek_v3.modeling_deepseek_v3 import DeepseekV3MLP
from ..llama.modeling_llama import (
    LlamaAttention,
    LlamaForCausalLM,
    LlamaModel,
    LlamaModelStandalone,
)
from ..qwen3_next.modeling_qwen3_next import Qwen3NextExperts
from .configuration_afmoe import AfmoeConfig


class AfmoeAttention(LlamaAttention):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        nkw = dict(dtype=dtype, param_dtype=param_dtype)
        self.q_norm = RMSNorm(self.head_dim, config.rms_norm_eps, **nkw)
        self.k_norm = RMSNorm(self.head_dim, config.rms_norm_eps, **nkw)
        self.gate_proj = Linear(config.hidden_size,
                                self.num_heads * self.head_dim, False, **kw)
        # NoPE on global layers (reference :118: rope only when sliding)
        self.apply_rope = config.layer_types[layer_idx] == "sliding_attention"

    def project_qkv(self, params, hidden):
        q, k, v = super().project_qkv(params, hidden)
        self._gate = self.gate_proj(params["gate_proj"], hidden)
        return q, k, v

    def project_out(self, params, out):
        out = out * jax.nn.sigmoid(self._gate)
        return self.o_proj(params["o_proj"], out)


class AfmoeSparseMoeBlock(Module):
    """Token-choice sigmoid router + shared experts (reference :34-85)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.top_k = config.num_experts_per_tok
        self.num_experts = config.num_experts
        self.route_scale = config.route_scale
        self.hidden = config.hidden_size
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.experts = Qwen3NextExperts(config, **kw)
        self.shared_experts = DeepseekV3MLP(
            config, config.moe_intermediate_size * config.num_shared_experts, **kw)

    def init(self, rng):
        params = super().init(rng)
        # reference _init_weights: router gate zero-init
        params["router"] = {"gate": {"weight": jnp.zeros(
            (self.num_experts, self.hidden), self.param_dtype)}}
        params["expert_bias"] = jnp.zeros((self.num_experts,), jnp.float32)
        return params

    def __call__(self, params, hidden):
        b, s, h = hidden.shape
        x = hidden.reshape(b * s, h)
        logits = (x.astype(jnp.float32)
                  @ params["router"]["gate"]["weight"].astype(jnp.float32).T)
        scores = jax.nn.sigmoid(logits)
        _, idx = jax.lax.top_k(scores + params["expert_bias"][None], self.top_k)
        w = jnp.take_along_axis(scores, idx, axis=-1)
        w = w / (jnp.sum(w, axis=-1, keepdims=True) + 1e-20) * self.route_scale
        routed = self.experts(params["experts"], x, w, idx)
        shared = self.shared_experts(params["shared_experts"], x)
        return (routed + shared).reshape(b, s, h).astype(hidden.dtype)


class AfmoeDecoderLayer(Module):
    """Sandwich-norm residual block (reference :150-190)."""

    @staticmethod
    def make_norm(config, **kw):
        return RMSNorm(config.hidden_size, config.rms_norm_eps, **kw)

    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.self_attn = AfmoeAttention(config, layer_idx, **kw)
        self.input_layernorm = RMSNorm(config.hidden_size, config.rms_norm_eps, **kw)
        self.post_attention_layernorm = RMSNorm(config.hidden_size,
                                                config.rms_norm_eps, **kw)
        self.pre_mlp_layernorm = RMSNorm(config.hidden_size, config.rms_norm_eps, **kw)
        self.post_mlp_layernorm = RMSNorm(config.hidden_size, config.rms_norm_eps, **kw)
        if layer_idx >= config.num_dense_layers:
            self.mlp = AfmoeSparseMoeBlock(config, **kw)
        else:
            self.mlp = DeepseekV3MLP(config, **kw)

    def __call__(self, params, hidden, cos, sin, attn_args, cache, cache_position):
        residual = hidden
        h = self.input_layernorm(params["input_layernorm"], hidden)
        h, cache = self.self_attn(params["self_attn"], h, cos, sin, attn_args,
                                  cache, cache_position)
        h = self.post_attention_layernorm(params["post_attention_layernorm"], h)
        hidden = residual + h
        residual = hidden
        h = self.pre_mlp_layernorm(params["pre_mlp_layernorm"], hidden)
        h = self.mlp(params["mlp"], h)
        h = self.post_mlp_layernorm(params["post_mlp_layernorm"], h)
        return residual + h, cache


class AfmoeModel(LlamaModel):
    decoder_layer_cls = AfmoeDecoderLayer


class AfmoeForCausalLM(LlamaForCausalLM):
    config_class = AfmoeConfig
    model_cls = AfmoeModel


class AfmoeModelStandalone(LlamaModelStandalone):
    config_class = AfmoeConfig
    model_cls = AfmoeModel
