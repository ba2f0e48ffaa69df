"""A.X-K2 decoder (reference models/axk2/modular_axk2.py).

DeepSeek-V3.2 (MLA + DSA indexer + sigmoid-bias MoE) with three deltas:
- query path: ``q_gate_proj`` consumes [q_a_layernorm(q_a) | q_a] (the raw
  LoRA bottleneck concatenated with its normed residual) and emits both the
  per-head queries AND a per-channel output gate; the attention output is
  multiplied by sigmoid(gate) in fp32 before o_proj (reference :262-330)
- gated RMSNorm: every input_layernorm — and the post_attention_layernorm on
  sparse (MoE) layers — is RMSNorm followed by a low-rank (gated_norm_rank)
  input-dependent sigmoid gate, Megatron GatedNormWrapper style (:156-168)
- routing: the group-limited choice mask fills excluded experts with 0.0
  (not -inf) to match the reference scoreboard exactly (:174-190); the
  A.X-K2-Light default routes over one all-expert group
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.module import Linear, Module, RMSNorm, normal_init
from ..deepseek_v3.modeling_deepseek_v3 import DeepseekV3MoE
from ..deepseek_v32.modeling_deepseek_v32 import (
    DeepseekV32Attention,
    DeepseekV32DecoderLayer,
    DeepseekV32ForCausalLM,
    DeepseekV32Model,
    DeepseekV32ModelStandalone,
)
from .configuration_axk2 import AXK2Config


class AXK2GatedRMSNorm(Module):
    """y = RMSNorm(x); y * sigmoid(fc2(silu(fc1(y)))) (reference :156)."""

    def __init__(self, config, eps, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.norm = RMSNorm(config.hidden_size, eps, dtype=dtype, param_dtype=param_dtype)
        self.fc1 = Linear(config.hidden_size, config.gated_norm_rank, False, **kw)
        self.fc2 = Linear(config.gated_norm_rank, config.hidden_size, False, **kw)

    def __call__(self, params, x):
        y = self.norm(params["norm"], x)
        g = self.fc2(params["fc2"], jax.nn.silu(self.fc1(params["fc1"], y)))
        return (y * jax.nn.sigmoid(g.astype(jnp.float32))).astype(y.dtype)


class AXK2Attention(DeepseekV32Attention):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        del self._children["q_b_proj"]
        object.__delattr__(self, "q_b_proj")
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        # fused q + gate (kept fused: FP8 hub scales cover the fused matrix)
        self.q_gate_proj = Linear(
            2 * config.q_lora_rank,
            self.num_heads * (self.qk_head_dim + self.v_head_dim), False, **kw)

    def project_q(self, params, hidden):
        b, s, _ = hidden.shape
        q_compressed = self.q_a_proj(params["q_a_proj"], hidden)
        q_resid = self.q_a_layernorm(params["q_a_layernorm"], q_compressed)
        qg = self.q_gate_proj(params["q_gate_proj"],
                              jnp.concatenate([q_resid, q_compressed], axis=-1))
        qg = qg.reshape(b, s, self.num_heads, self.qk_head_dim + self.v_head_dim)
        q = qg[..., : self.qk_head_dim]
        gate = qg[..., self.qk_head_dim:].reshape(b, s, -1)
        return q, q_resid, gate


class AXK2MoE(DeepseekV3MoE):
    def route(self, params, scores):
        """Reference AXK2TopkRouter.forward (:190): group mask fills 0.0."""
        cfg = self.config
        t, e = scores.shape
        choice = scores + params["gate"]["e_score_correction_bias"].astype(
            jnp.float32)[None, :]
        if cfg.n_group > 1:
            group_scores = choice.reshape(t, cfg.n_group, e // cfg.n_group)
            top2, _ = jax.lax.top_k(group_scores, 2)
            _, group_idx = jax.lax.top_k(top2.sum(-1), cfg.topk_group)
            group_mask = jnp.zeros((t, cfg.n_group), bool).at[
                jnp.arange(t)[:, None], group_idx].set(True)
            allowed = jnp.repeat(group_mask, e // cfg.n_group, axis=-1)
            choice = jnp.where(allowed, choice, 0.0)
        _, topk_idx = jax.lax.top_k(choice, self.top_k)
        topk_w = jnp.take_along_axis(scores, topk_idx, axis=-1)
        if cfg.norm_topk_prob:
            topk_w = topk_w / (topk_w.sum(-1, keepdims=True) + 1e-20)
        return topk_w * cfg.routed_scaling_factor, topk_idx


class AXK2DecoderLayer(DeepseekV32DecoderLayer):
    attention_cls = AXK2Attention
    moe_cls = AXK2MoE

    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        sparse = layer_idx >= config.first_k_dense_replace
        del self._children["input_layernorm"]
        object.__delattr__(self, "input_layernorm")
        self.input_layernorm = AXK2GatedRMSNorm(config, config.rms_norm_eps, **kw)
        if sparse:
            del self._children["post_attention_layernorm"]
            object.__delattr__(self, "post_attention_layernorm")
            self.post_attention_layernorm = AXK2GatedRMSNorm(
                config, config.rms_norm_eps, **kw)


class AXK2Model(DeepseekV32Model):
    decoder_layer_cls = AXK2DecoderLayer


class AXK2ForCausalLM(DeepseekV32ForCausalLM):
    config_class = AXK2Config
    model_cls = AXK2Model


class AXK2ModelStandalone(DeepseekV32ModelStandalone):
    config_class = AXK2Config
    model_cls = AXK2Model
