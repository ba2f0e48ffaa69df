"""DeepSeek-V3 decoder, TPU-native.

Semantics match reference
src/transformers/models/deepseek_v3/modeling_deepseek_v3.py:

- **MLA (Multi-head Latent Attention)** (:361): queries optionally low-rank
  (q_a → RMSNorm → q_b), k/v compressed to a ``kv_lora_rank`` latent + a
  SHARED single-head rope key. The CACHE stores the compressed latents
  (kv_nope [B,S,1,R] as "keys", rotated k_rot [B,S,1,Dr] as "values" —
  reference :455 caches before expansion), and ``kv_b_proj`` re-expands the
  full history each step. On TPU this is the bandwidth-optimal layout: decode
  reads R+Dr (576) bytes/token of cache instead of H·(Dk+Dv) and the
  expansion is one large MXU matmul.
- **Sigmoid group-limited router** (:131): sigmoid scores + learned
  correction bias for CHOICE only, group top-2-sum → topk_group groups →
  top-k experts, weights are the raw (pre-bias) sigmoid scores, optionally
  normalized, scaled by ``routed_scaling_factor``.
- **MoE with shared experts** (:212); first ``first_k_dense_replace`` layers
  use a dense MLP.
- **Interleaved rope** on the rope slice only (:320
  apply_rotary_pos_emb_interleave: interleaved input pairs, contiguous-half
  output), with the yarn mscale² factor folded into the attention scale
  (:271 yarn_apply_mscale).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...cache_utils import StaticKVCache
from ...core.module import Linear, Module, RMSNorm, normal_init
from ...modeling_outputs import BaseModelOutputWithPast
from ...ops.moe import get_experts_fn
from ...ops.activations import get_activation
from ..llama.modeling_llama import (
    DECODER_TP_PLAN,
    LlamaDecoderLayer,
    LlamaForCausalLM,
    LlamaMLP,
    LlamaModel,
    LlamaModelStandalone,
)
from .configuration_deepseek_v3 import DeepseekV3Config


def yarn_mscale_factor(config) -> float:
    """reference :271 yarn_apply_mscale — mscale² multiplier on the attention
    scale when yarn rope with mscale_all_dim is active."""
    import math

    rope = getattr(config, "rope_scaling", None) or {}
    if rope.get("rope_type", rope.get("type", "default")) == "default":
        return 1.0
    mscale_all_dim = rope.get("mscale_all_dim", 0)
    factor = rope.get("factor", 1.0)
    if not mscale_all_dim or factor <= 1:
        return 1.0
    mscale = 0.1 * mscale_all_dim * math.log(factor) + 1.0
    return mscale * mscale


def apply_rope_interleave_deepseek(x, cos, sin):
    """Interleaved-pair input, contiguous-half output (reference :320):
    pairs (x0,x1),(x2,x3),... each rotated by one frequency; the rotated
    evens land in the first half of the output, odds in the second."""
    half = cos.shape[-1] // 2
    c = cos[:, :, None, :half]
    s = sin[:, :, None, :half]
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    return jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)


class DeepseekV3Attention(Module):
    """MLA (reference :361)."""

    def __init__(self, config: DeepseekV3Config, layer_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.layer_idx = layer_idx
        self.num_heads = config.num_attention_heads
        self.q_lora_rank = config.q_lora_rank
        self.kv_lora_rank = config.kv_lora_rank
        self.qk_rope_head_dim = config.qk_rope_head_dim
        self.qk_nope_head_dim = config.qk_nope_head_dim
        self.v_head_dim = config.v_head_dim
        self.qk_head_dim = config.qk_nope_head_dim + config.qk_rope_head_dim
        self.scale = (self.qk_head_dim**-0.5) * yarn_mscale_factor(config)
        self.sliding_window = None
        self.logit_cap = None
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        bias = config.attention_bias
        if self.q_lora_rank is None:
            self.q_proj = Linear(config.hidden_size, self.num_heads * self.qk_head_dim, False, **kw)
        else:
            self.q_a_proj = Linear(config.hidden_size, self.q_lora_rank, bias, **kw)
            self.q_a_layernorm = RMSNorm(self.q_lora_rank, config.rms_norm_eps,
                                         dtype=dtype, param_dtype=param_dtype)
            self.q_b_proj = Linear(self.q_lora_rank, self.num_heads * self.qk_head_dim, False, **kw)
        self.kv_a_proj_with_mqa = Linear(
            config.hidden_size, config.kv_lora_rank + config.qk_rope_head_dim, bias, **kw)
        self.kv_a_layernorm = RMSNorm(config.kv_lora_rank, config.rms_norm_eps,
                                      dtype=dtype, param_dtype=param_dtype)
        self.kv_b_proj = Linear(
            config.kv_lora_rank, self.num_heads * (self.qk_nope_head_dim + self.v_head_dim), False, **kw)
        self.o_proj = Linear(self.num_heads * self.v_head_dim, config.hidden_size, bias, **kw)

    def apply_mla_rope(self, q_rot, k_rot, cos, sin):
        """Rope on the rotary sub-dims; V2 overrides with the complex-pair
        variant (reference modeling_deepseek_v2.py:272 apply_rotary_emb)."""
        if self.config.rope_interleave:
            q_rot = apply_rope_interleave_deepseek(q_rot, cos, sin)
            k_rot = apply_rope_interleave_deepseek(k_rot[:, :, None, :], cos, sin)[:, :, 0]
        else:
            from ...ops.rope import apply_rotary_pos_emb

            q_rot, k_rot4 = apply_rotary_pos_emb(q_rot, k_rot[:, :, None, :], cos, sin)
            k_rot = k_rot4[:, :, 0]
        return q_rot, k_rot

    def scale_q(self, q, attn_args):
        """Hook: post-rope query scaling (Mistral4 llama-4 attn temperature)."""
        return q

    def expand_kv(self, params, kv_nope, k_rot):
        """Expand cached latents to per-head K/V (reference expand_kv :410).
        kv_nope [B, S, R] -> K [B, S, H, Dk], V [B, S, H, Dv]."""
        b, s, _ = kv_nope.shape
        kv = self.kv_b_proj(params["kv_b_proj"], kv_nope)
        kv = kv.reshape(b, s, self.num_heads, self.qk_nope_head_dim + self.v_head_dim)
        k_nope = kv[..., : self.qk_nope_head_dim]
        v = kv[..., self.qk_nope_head_dim:]
        k_rot = jnp.broadcast_to(k_rot[:, :, None, :], (b, s, self.num_heads, self.qk_rope_head_dim))
        k = jnp.concatenate([k_nope, k_rot.astype(k_nope.dtype)], axis=-1)
        return k, v

    def __call__(self, params, hidden, cos, sin, attn_args, cache: Optional[StaticKVCache], cache_position):
        b, s, _ = hidden.shape
        if self.q_lora_rank is None:
            q = self.q_proj(params["q_proj"], hidden)
        else:
            q = self.q_b_proj(params["q_b_proj"], self.q_a_layernorm(
                params["q_a_layernorm"], self.q_a_proj(params["q_a_proj"], hidden)))
        q = q.reshape(b, s, self.num_heads, self.qk_head_dim)
        q_pass = q[..., : self.qk_nope_head_dim]
        q_rot = q[..., self.qk_nope_head_dim:]

        compressed = self.kv_a_proj_with_mqa(params["kv_a_proj_with_mqa"], hidden)
        kv_nope = self.kv_a_layernorm(params["kv_a_layernorm"], compressed[..., : self.kv_lora_rank])
        k_rot = compressed[..., self.kv_lora_rank:]  # [B, S, Dr] shared across heads

        q_rot, k_rot = self.apply_mla_rope(q_rot, k_rot, cos, sin)
        q = jnp.concatenate([q_pass, q_rot], axis=-1)
        q = self.scale_q(q, attn_args)

        if cache is not None:
            # cache the COMPRESSED latents as single-head k/v slots
            cache = cache.update(self.layer_idx, kv_nope[:, :, None, :],
                                 k_rot[:, :, None, :], cache_position)
            kv_nope_full, k_rot_full = cache.layer(self.layer_idx)
            kv_nope = kv_nope_full[:, :, 0].astype(self.dtype)
            k_rot = k_rot_full[:, :, 0].astype(self.dtype)

        k, v = self.expand_kv(params, kv_nope, k_rot)

        from ...ops.attention import get_attention_fn

        attn_fn = get_attention_fn(self.config.attn_implementation)
        out = attn_fn(q, k, v, scale=self.scale, **attn_args)
        out = out.reshape(b, s, self.num_heads * self.v_head_dim)
        return self.o_proj(params["o_proj"], out), cache


class DeepseekV3MLP(LlamaMLP):
    def __init__(self, config, intermediate_size=None, *, dtype, param_dtype):
        if intermediate_size is not None:
            import copy

            config = copy.copy(config)
            config.intermediate_size = intermediate_size
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)


def deepseek_route(scores: jnp.ndarray, bias: jnp.ndarray, *, n_group: int,
                   topk_group: int, top_k: int, norm_topk_prob: bool,
                   routed_scaling_factor: float):
    """Sigmoid group-limited routing (reference DeepseekV3TopkRouter :144).
    scores [T, E] sigmoid probabilities; bias added for CHOICE only."""
    t, e = scores.shape
    choice = scores + bias[None, :]
    group_scores = choice.reshape(t, n_group, e // n_group)
    top2, _ = jax.lax.top_k(group_scores, 2)
    group_rank = top2.sum(-1)  # [T, G]
    _, group_idx = jax.lax.top_k(group_rank, topk_group)
    group_mask = jnp.zeros((t, n_group), bool).at[
        jnp.arange(t)[:, None], group_idx].set(True)
    allowed = jnp.repeat(group_mask, e // n_group, axis=-1)
    masked_choice = jnp.where(allowed, choice, -jnp.inf)
    _, topk_idx = jax.lax.top_k(masked_choice, top_k)
    topk_w = jnp.take_along_axis(scores, topk_idx, axis=-1)
    if norm_topk_prob:
        topk_w = topk_w / (topk_w.sum(-1, keepdims=True) + 1e-20)
    return topk_w * routed_scaling_factor, topk_idx


class DeepseekV3MoE(Module):
    """Routed experts + shared experts (reference :212)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.num_experts = config.n_routed_experts
        self.top_k = config.num_experts_per_tok
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.gate = _DeepseekGate(config, **kw)
        self.experts = [DeepseekV3MLP(config, config.moe_intermediate_size, **kw)
                        for _ in range(config.n_routed_experts)]
        self.shared_experts = DeepseekV3MLP(
            config, config.moe_intermediate_size * config.n_shared_experts, **kw)
        self.act_fn = get_activation(config.hidden_act)

    def route(self, params, scores):
        """Routing hook over sigmoid scores [T, E] → (topk_w, topk_idx)."""
        return deepseek_route(
            scores, params["gate"]["e_score_correction_bias"].astype(jnp.float32),
            n_group=self.config.n_group, topk_group=self.config.topk_group,
            top_k=self.top_k, norm_topk_prob=self.config.norm_topk_prob,
            routed_scaling_factor=self.config.routed_scaling_factor)

    def __call__(self, params, hidden):
        b, s, h = hidden.shape
        x = hidden.reshape(-1, h)
        scores = jax.nn.sigmoid(
            jnp.dot(x.astype(jnp.float32), params["gate"]["weight"].astype(jnp.float32)))
        topk_w, topk_idx = self.route(params, scores)
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
        shared = self.shared_experts(params["shared_experts"], hidden)
        return routed.reshape(b, s, h) + shared


class _DeepseekGate(Module):
    """Router params: [E, H] weight (torch Linear layout kept as-is) + choice
    bias buffer (reference DeepseekV3TopkRouter)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.num_experts = config.n_routed_experts
        self.hidden_size = config.hidden_size

    def init(self, rng):
        return {
            "weight": jnp.zeros((self.hidden_size, self.num_experts), self.param_dtype),
            "e_score_correction_bias": jnp.zeros((self.num_experts,), jnp.float32),
        }

    def param_load_transform(self, name, arr):
        if name == "weight":
            import numpy as np

            return np.ascontiguousarray(arr.transpose())
        return arr

    def param_save_transform(self, name, arr):
        if name == "weight":
            return arr.T
        return arr


class DeepseekV3DecoderLayer(LlamaDecoderLayer):
    attention_cls = DeepseekV3Attention
    moe_cls = None  # subclass hook (A.X-K1 post-MoE norm)

    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        if layer_idx >= config.first_k_dense_replace:
            self.mlp = (self.moe_cls or DeepseekV3MoE)(config, **kw)
        else:
            self.mlp = DeepseekV3MLP(config, **kw)


class DeepseekV3Model(LlamaModel):
    decoder_layer_cls = DeepseekV3DecoderLayer

    def compute_rope(self, position_ids):
        # rope width is qk_rope_head_dim (config.head_dim, reference :124);
        # interleave handled at application time.
        return super().compute_rope(position_ids)


class DeepseekV3ForCausalLM(LlamaForCausalLM):
    config_class = DeepseekV3Config
    model_cls = DeepseekV3Model
    _tp_plan = DECODER_TP_PLAN

    def init_cache(self, batch_size: int, max_len: int, dtype=None,
                   implementation: str = "static"):
        """MLA cache: compressed latents, NOT per-head K/V — 'key' slots hold
        the [B,S,1,kv_lora_rank] latent, 'value' slots the shared
        [B,S,1,qk_rope_head_dim] rotated key (reference caches pre-expansion,
        modeling_deepseek_v3.py:455)."""
        cfg = self.config
        dtype = dtype or self.dtype
        keys, values = [], []
        for _ in range(cfg.num_hidden_layers):
            keys.append(jnp.zeros((batch_size, max_len, 1, cfg.kv_lora_rank), dtype))
            values.append(jnp.zeros((batch_size, max_len, 1, cfg.qk_rope_head_dim), dtype))
        return StaticKVCache(keys=tuple(keys), values=tuple(values),
                             layer_windows=(None,) * cfg.num_hidden_layers,
                             max_len=max_len)


class DeepseekV3ModelStandalone(LlamaModelStandalone):
    config_class = DeepseekV3Config
    model_cls = DeepseekV3Model
