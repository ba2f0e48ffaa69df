"""DeepseekV2 decoder (reference src/transformers/models/deepseek_v2/modular_deepseek_v2.py).

MLA like V3 (compressed latent cache) with the V2 differences:
- complex-pair rope (reference apply_rotary_emb :272): pairs stay
  INTERLEAVED in the output (V3's variant regroups halves);
- plain qk_head_dim^-0.5 scale (yarn scaling rides on the rope tables);
- softmax router with ``greedy`` / ``group_limited_greedy`` (group max)
  top-k, weights scaled by routed_scaling_factor, no renormalization;
- shared experts added to the routed output; dense MLPs on the first
  ``first_k_dense_replace`` layers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.module import Module, normal_init
from ...ops.activations import get_activation
from ...ops.moe import get_experts_fn
from ..deepseek_v3.modeling_deepseek_v3 import DeepseekV3Attention, DeepseekV3MLP
from ..llama.modeling_llama import (
    LlamaDecoderLayer,
    LlamaForCausalLM,
    LlamaModel,
    LlamaModelStandalone,
)
from .configuration_deepseek_v2 import DeepseekV2Config


def apply_rope_complex_pairs(x, cos, sin):
    """Reference apply_rotary_emb (modeling_deepseek_v2.py:272): complex
    multiply per pair; output keeps the interleaved pair layout."""
    half = cos.shape[-1] // 2
    c = cos[:, :, None, :half]
    s = sin[:, :, None, :half]
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    o1 = x1 * c - x2 * s
    o2 = x1 * s + x2 * c
    return jnp.stack([o1, o2], axis=-1).reshape(x.shape).astype(x.dtype)


class DeepseekV2Attention(DeepseekV3Attention):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        # V2 uses the plain scale; yarn attention scaling rides on the tables
        self.scale = self.qk_head_dim ** -0.5

    def apply_mla_rope(self, q_rot, k_rot, cos, sin):
        q_rot = apply_rope_complex_pairs(q_rot, cos, sin)
        k_rot = apply_rope_complex_pairs(k_rot[:, :, None, :], cos, sin)[:, :, 0]
        return q_rot, k_rot


class _V2Gate(Module):
    """Router weight [E, H] (torch layout kept, float32)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.e = config.n_routed_experts
        self.h = config.hidden_size

    def init(self, rng):
        return {"weight": jnp.zeros((self.e, self.h), jnp.float32)}


class DeepseekV2Moe(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.gate = _V2Gate(config, **kw)
        self.experts = [DeepseekV3MLP(config, config.moe_intermediate_size, **kw)
                        for _ in range(config.n_routed_experts)]
        self.shared_experts = DeepseekV3MLP(
            config, config.moe_intermediate_size * config.n_shared_experts, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, hidden):
        b, s, h = hidden.shape
        cfg = self.config
        x = hidden.reshape(-1, h)
        logits = jnp.dot(x.astype(jnp.float32),
                         params["gate"]["weight"].astype(jnp.float32).T)
        scores = jax.nn.softmax(logits, axis=-1)
        if cfg.topk_method == "group_limited_greedy":
            t, e = scores.shape
            g = cfg.n_group
            group_scores = scores.reshape(t, g, e // g).max(-1)          # [T, G]
            _, group_idx = jax.lax.top_k(group_scores, cfg.topk_group)
            group_mask = jnp.zeros((t, g), bool).at[
                jnp.arange(t)[:, None], group_idx].set(True)
            allowed = jnp.repeat(group_mask, e // g, axis=-1)
            scores = jnp.where(allowed, scores, 0.0)
        w, idx = jax.lax.top_k(scores, cfg.num_experts_per_tok)
        w = w * cfg.routed_scaling_factor
        e = cfg.n_routed_experts
        wg = jnp.stack([params["experts"][str(i)]["gate_proj"]["weight"] for i in range(e)])
        wu = jnp.stack([params["experts"][str(i)]["up_proj"]["weight"] for i in range(e)])
        wd = jnp.stack([params["experts"][str(i)]["down_proj"]["weight"] for i in range(e)])
        experts_fn = get_experts_fn(getattr(cfg, "experts_implementation", None))
        out = experts_fn(x.astype(self.dtype), wg.astype(self.dtype), wu.astype(self.dtype),
                         wd.astype(self.dtype), w, idx, self.act)
        out = out.reshape(b, s, h) + self.shared_experts(params["shared_experts"], hidden)
        return out.astype(hidden.dtype)


class DeepseekV2DecoderLayer(LlamaDecoderLayer):
    attention_cls = DeepseekV2Attention

    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        if layer_idx >= config.first_k_dense_replace:
            self.mlp = DeepseekV2Moe(config, **kw)
        else:
            self.mlp = DeepseekV3MLP(config, **kw)


class DeepseekV2Model(LlamaModel):
    decoder_layer_cls = DeepseekV2DecoderLayer

    def compute_rope(self, position_ids):
        # width = qk_rope_head_dim; the pair angles repeat per half (the
        # complex-pair application slices the first half)
        return super().compute_rope(position_ids)


class DeepseekV2ForCausalLM(LlamaForCausalLM):
    config_class = DeepseekV2Config
    model_cls = DeepseekV2Model

    def init_cache(self, batch_size: int, max_len: int, dtype=None,
                   implementation: str = "static"):
        from ...cache_utils import StaticKVCache

        cfg = self.config
        dtype = dtype or self.dtype
        keys, values = [], []
        for _ in range(cfg.num_hidden_layers):
            keys.append(jnp.zeros((batch_size, max_len, 1, cfg.kv_lora_rank), dtype))
            values.append(jnp.zeros((batch_size, max_len, 1, cfg.qk_rope_head_dim), dtype))
        return StaticKVCache(keys=tuple(keys), values=tuple(values),
                             layer_windows=(None,) * cfg.num_hidden_layers,
                             max_len=max_len)


class DeepseekV2ModelStandalone(LlamaModelStandalone):
    config_class = DeepseekV2Config
    model_cls = DeepseekV2Model
