"""GLM-MoE-DSA / GLM-5 (reference models/glm_moe_dsa/modular_glm_moe_dsa.py):
DeepSeek-V3.2's sparse attention with two changes — the indexer applies
INTERLEAVED rope (same style as the MLA path, :101) and layers marked
"shared" in ``config.indexer_types`` reuse the previous full layer's top-k
selection instead of running their own indexer (:150). The shared top-k
bias rides the mutable ``attn_args`` dict through the layer loop — all
layers trace in one program, so this is ordinary in-trace dataflow."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...cache_utils import StaticKVCache
from ...core.module import Module
from ..deepseek_v3.modeling_deepseek_v3 import (
    DeepseekV3ForCausalLM,
    DeepseekV3Model,
    DeepseekV3ModelStandalone,
    apply_rope_interleave_deepseek,
)
from ..deepseek_v32.modeling_deepseek_v32 import (
    DeepseekV32Attention,
    DeepseekV32DecoderLayer,
    DeepseekV32ForCausalLM,
    DeepseekV32Indexer,
)
from .configuration_glm_moe_dsa import GlmMoeDsaConfig


class GlmMoeDsaIndexer(DeepseekV32Indexer):
    """Indexer rope is interleaved here (reference :101)."""

    def project_key(self, params, hidden, cos, sin):
        k = self.k_norm(params["k_norm"], self.wk(params["wk"], hidden))
        k_rot = k[..., : self.qk_rope_head_dim]
        k_pass = k[..., self.qk_rope_head_dim:]
        k_rot = apply_rope_interleave_deepseek(k_rot[:, :, None, :], cos, sin)[:, :, 0]
        return jnp.concatenate([k_rot, k_pass], axis=-1)

    def scores(self, params, hidden, q_resid, k_keys, cos, sin):
        b, s, _ = hidden.shape
        q = self.wq_b(params["wq_b"], q_resid).reshape(b, s, self.n_heads, self.head_dim)
        q_rot = q[..., : self.qk_rope_head_dim]
        q_pass = q[..., self.qk_rope_head_dim:]
        q_rot = apply_rope_interleave_deepseek(q_rot, cos, sin)
        q = jnp.concatenate([q_rot, q_pass], axis=-1)
        s_htq = jnp.einsum("bshd,btd->bsht", q.astype(jnp.float32),
                           k_keys.astype(jnp.float32)) * self.scale
        s_htq = jax.nn.relu(s_htq)
        w = self.weights_proj(params["weights_proj"], hidden).astype(jnp.float32)
        w = w * (self.n_heads ** -0.5)
        return jnp.einsum("bsh,bsht->bst", w, s_htq)


class GlmMoeDsaAttention(DeepseekV32Attention):
    def __init__(self, config: GlmMoeDsaConfig, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        self.skip_topk = config.indexer_types[layer_idx] == "shared"
        self._index_head_dim = config.index_head_dim
        if self.skip_topk:
            del self._children["indexer"]
            object.__delattr__(self, "indexer")
            self.indexer = None
        else:
            del self._children["indexer"]
            object.__delattr__(self, "indexer")
            self.indexer = GlmMoeDsaIndexer(config, layer_idx, dtype=dtype,
                                            param_dtype=param_dtype)

    def __call__(self, params, hidden, cos, sin, attn_args,
                 cache: Optional[StaticKVCache], cache_position):
        b, s, _ = hidden.shape
        q_resid = self.q_a_layernorm(
            params["q_a_layernorm"], self.q_a_proj(params["q_a_proj"], hidden))
        q = self.q_b_proj(params["q_b_proj"], q_resid)
        q = q.reshape(b, s, self.num_heads, self.qk_head_dim)
        q_pass = q[..., : self.qk_nope_head_dim]
        q_rot = q[..., self.qk_nope_head_dim:]

        compressed = self.kv_a_proj_with_mqa(params["kv_a_proj_with_mqa"], hidden)
        kv_nope = self.kv_a_layernorm(params["kv_a_layernorm"],
                                      compressed[..., : self.kv_lora_rank])
        k_rot = compressed[..., self.kv_lora_rank:]
        q_rot, k_rot = self.apply_mla_rope(q_rot, k_rot, cos, sin)
        q = jnp.concatenate([q_pass, q_rot], axis=-1)

        if self.indexer is not None:
            idx_key = self.indexer.project_key(params["indexer"], hidden, cos, sin)
        else:
            idx_key = None

        if cache is not None:
            streams = [k_rot]
            if idx_key is not None:
                streams.append(idx_key.astype(k_rot.dtype))
            else:
                # shared layers still pad the value line to the cache width
                streams.append(jnp.zeros(
                    (b, s, self._index_head_dim), k_rot.dtype))
            packed = jnp.concatenate(streams, axis=-1)
            cache = cache.update(self.layer_idx, kv_nope[:, :, None, :],
                                 packed[:, :, None, :], cache_position)
            kv_nope_full, packed_full = cache.layer(self.layer_idx)
            kv_nope = kv_nope_full[:, :, 0].astype(self.dtype)
            packed_full = packed_full[:, :, 0]
            k_rot = packed_full[..., : self.qk_rope_head_dim].astype(self.dtype)
            if idx_key is not None:
                idx_key = packed_full[..., self.qk_rope_head_dim:].astype(self.dtype)

        k, v = self.expand_kv(params, kv_nope, k_rot)

        from ...ops.attention import _render_bias, get_attention_fn

        args = dict(attn_args)
        bias = args.pop("bias", None)
        if bias is None:
            bias = _render_bias(q, k, args.get("q_positions"),
                                args.get("kv_valid"),
                                args.get("is_causal", True), None, None,
                                args.get("q_segment_ids"),
                                args.get("kv_segment_ids"), None, None)
        if self.indexer is not None:
            index_scores = self.indexer.scores(params["indexer"], hidden,
                                               q_resid, idx_key, cos, sin)
            index_scores = index_scores + bias[:, 0].astype(jnp.float32)
            topk = min(self.index_topk, index_scores.shape[-1])
            _, top_idx = jax.lax.top_k(index_scores, topk)
            t = index_scores.shape[-1]
            selected = jax.nn.one_hot(top_idx, t, dtype=jnp.float32).sum(-2) > 0
            sparse = jnp.where(selected, 0.0, jnp.finfo(jnp.float32).min)
            # publish for downstream "shared" layers (in-trace dataflow)
            attn_args["_dsa_sparse_bias"] = sparse
        else:
            sparse = attn_args.get("_dsa_sparse_bias")
            if sparse is None:
                raise ValueError(
                    "Shared DSA layers require a preceding full indexer layer.")
        bias = bias.astype(jnp.float32) + sparse[:, None, :, :]
        for key in ("kv_valid", "q_positions", "is_causal", "sliding_window",
                    "q_segment_ids", "kv_segment_ids", "q_block_ids",
                    "kv_block_ids", "chunk_size", "_dsa_sparse_bias"):
            args.pop(key, None)

        attn_fn = get_attention_fn("eager")
        out = attn_fn(q, k, v, bias, scale=self.scale, **args)
        out = out.reshape(b, s, self.num_heads * self.v_head_dim)
        return self.o_proj(params["o_proj"], out), cache

class GlmMoeDsaDecoderLayer(DeepseekV32DecoderLayer):
    attention_cls = GlmMoeDsaAttention


class GlmMoeDsaModel(DeepseekV3Model):
    decoder_layer_cls = GlmMoeDsaDecoderLayer


class GlmMoeDsaForCausalLM(DeepseekV32ForCausalLM):
    config_class = GlmMoeDsaConfig
    model_cls = GlmMoeDsaModel


class GlmMoeDsaModelStandalone(DeepseekV3ModelStandalone):
    config_class = GlmMoeDsaConfig
    model_cls = GlmMoeDsaModel
