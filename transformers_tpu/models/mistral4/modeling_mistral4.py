"""Mistral4 decoder (reference models/mistral4/modular_mistral4.py):
DeepSeek-style MLA with llama-4 attention temperature scaling
(q *= 1 + beta*log(1 + floor(pos/original_max))), and a SOFTMAX group
router — group scores are the top-2 sum per group, selected groups' softmax
scores feed plain top-k (no e-score bias)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..deepseek_v3.modeling_deepseek_v3 import (
    DeepseekV3Attention,
    DeepseekV3DecoderLayer,
    DeepseekV3ForCausalLM,
    DeepseekV3Model,
    DeepseekV3ModelStandalone,
    DeepseekV3MoE,
)
from .configuration_mistral4 import Mistral4Config


class Mistral4Attention(DeepseekV3Attention):
    def scale_q(self, q, attn_args):
        pos = attn_args.get("q_positions")
        if pos is None or not getattr(self.config, "llama_4_scaling_beta", None):
            return q
        beta = self.config.llama_4_scaling_beta
        omax = self.config.original_max_position_embeddings
        scale = 1.0 + beta * jnp.log1p(jnp.floor(pos.astype(jnp.float32) / omax))
        return q * scale[:, :, None, None].astype(q.dtype)


class Mistral4MoE(DeepseekV3MoE):
    def route(self, params, x):
        """Softmax scores; groups ranked by their top-2 sum (reference
        Mistral4TopkRouter.forward)."""
        cfg = self.config
        logits = jnp.dot(x.astype(jnp.float32),
                         params["gate"]["weight"].astype(jnp.float32))
        scores = jax.nn.softmax(logits, axis=-1)
        t, e = scores.shape
        g = cfg.n_group
        grouped = scores.reshape(t, g, e // g)
        top2, _ = jax.lax.top_k(grouped, min(2, e // g))
        group_scores = top2.sum(-1)
        _, group_idx = jax.lax.top_k(group_scores, cfg.topk_group)
        group_mask = jnp.zeros((t, g), bool).at[
            jnp.arange(t)[:, None], group_idx].set(True)
        mask = jnp.repeat(group_mask, e // g, axis=-1)
        choice = jnp.where(mask, scores, 0.0)
        topk_w, topk_idx = jax.lax.top_k(choice, self.top_k)
        topk_w = jnp.take_along_axis(scores, topk_idx, axis=-1)
        if cfg.norm_topk_prob:
            topk_w = topk_w / (topk_w.sum(-1, keepdims=True) + 1e-20)
        return (topk_w * cfg.routed_scaling_factor).astype(x.dtype), topk_idx

    def __call__(self, params, hidden):
        from ...ops.moe import get_experts_fn

        b, s, h = hidden.shape
        x = hidden.reshape(-1, h)
        topk_w, topk_idx = self.route(params, x)
        w_gate = jnp.stack([params["experts"][str(e)]["gate_proj"]["weight"]
                            for e in range(self.num_experts)])
        w_up = jnp.stack([params["experts"][str(e)]["up_proj"]["weight"]
                          for e in range(self.num_experts)])
        w_down = jnp.stack([params["experts"][str(e)]["down_proj"]["weight"]
                            for e in range(self.num_experts)])
        experts_fn = get_experts_fn(getattr(self.config, "experts_implementation", None))
        routed = experts_fn(x.astype(self.dtype), w_gate.astype(self.dtype),
                            w_up.astype(self.dtype), w_down.astype(self.dtype),
                            topk_w, topk_idx, self.act_fn)
        out = routed.reshape(b, s, h)
        if self.config.n_shared_experts:
            out = out + self.shared_experts(params["shared_experts"], hidden)
        return out

    def __init__(self, config, *, dtype, param_dtype):
        import copy

        cfg = config
        if not config.n_shared_experts:
            cfg = copy.copy(config)
            cfg.n_shared_experts = 1  # placeholder for base construction
        super().__init__(cfg, dtype=dtype, param_dtype=param_dtype)
        self.config = config
        if not config.n_shared_experts:
            del self.shared_experts

    def init(self, rng):
        params = super().init(rng)
        # no e-score bias: plain softmax routing
        params["gate"].pop("e_score_correction_bias", None)
        return params


class Mistral4DecoderLayer(DeepseekV3DecoderLayer):
    attention_cls = Mistral4Attention
    moe_cls = Mistral4MoE


class Mistral4Model(DeepseekV3Model):
    decoder_layer_cls = Mistral4DecoderLayer


class Mistral4ForCausalLM(DeepseekV3ForCausalLM):
    config_class = Mistral4Config
    model_cls = Mistral4Model


class Mistral4ModelStandalone(DeepseekV3ModelStandalone):
    config_class = Mistral4Config
    model_cls = Mistral4Model
