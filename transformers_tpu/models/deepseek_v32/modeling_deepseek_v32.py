"""DeepSeek-V3.2 (reference models/deepseek_v32/modular_deepseek_v32.py).

DeepSeek Sparse Attention (DSA) on top of V3's MLA: a lightweight indexer
(own q/k projections off the shared q-LoRA residual, per-head score
weighting) picks ``index_topk`` keys per query and everything else is masked
out of the MLA attention. TPU-native formulation: the indexer's ReLU'd
scores are reduced over heads with learned weights, the top-k selection is a
``lax.top_k`` + one-hot scatter into an ADDITIVE bias (static shapes, no
boolean gather), and the indexer key stream rides the existing latent cache
by concatenation with the rope stream (one cache line per layer, no second
cache object). The reference's Hadamard rotate + FP8 scoring kernel are
precision optimizations with identical math (orthogonal transform preserves
dot products) and are deliberately not replicated (reference comment
:217-222).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...cache_utils import StaticKVCache
from ...core.module import LayerNorm, Linear, Module, normal_init
from ...ops.rope import apply_rotary_pos_emb
from ..deepseek_v3.modeling_deepseek_v3 import (
    DeepseekV3Attention,
    DeepseekV3DecoderLayer,
    DeepseekV3ForCausalLM,
    DeepseekV3Model,
    DeepseekV3ModelStandalone,
)
from .configuration_deepseek_v32 import DeepseekV32Config


class DeepseekV32Indexer(Module):
    """Reference DeepseekV32Indexer:175-273."""

    def __init__(self, config: DeepseekV32Config, layer_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.n_heads = config.index_n_heads
        self.head_dim = config.index_head_dim
        self.qk_rope_head_dim = config.qk_rope_head_dim
        self.index_topk = config.index_topk
        self.scale = self.head_dim ** -0.5
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.wq_b = Linear(config.q_lora_rank, self.n_heads * self.head_dim, False, **kw)
        self.wk = Linear(config.hidden_size, self.head_dim, False, **kw)
        self.k_norm = LayerNorm(self.head_dim, 1e-6, dtype=dtype, param_dtype=param_dtype)
        self.weights_proj = Linear(config.hidden_size, self.n_heads, False, **kw)

    def project_key(self, params, hidden, cos, sin):
        """Roped indexer key [B, S, D_idx] (cached pre-roped)."""
        k = self.k_norm(params["k_norm"], self.wk(params["wk"], hidden))
        k_rot = k[..., : self.qk_rope_head_dim]
        k_pass = k[..., self.qk_rope_head_dim:]
        # indexer rope is NON-interleaved half-split regardless of the MLA
        # style (reference :248)
        _, k_rot = apply_rotary_pos_emb(
            k_rot[:, :, None, :], k_rot[:, :, None, :], cos, sin)
        return jnp.concatenate([k_rot[:, :, 0], k_pass], axis=-1)

    def scores(self, params, hidden, q_resid, k_keys, cos, sin):
        """index_scores [B, S, T] (reference :239-263)."""
        b, s, _ = hidden.shape
        q = self.wq_b(params["wq_b"], q_resid).reshape(b, s, self.n_heads, self.head_dim)
        q_rot = q[..., : self.qk_rope_head_dim]
        q_pass = q[..., self.qk_rope_head_dim:]
        q_rot, _ = apply_rotary_pos_emb(q_rot, q_rot, cos, sin)
        q = jnp.concatenate([q_rot, q_pass], axis=-1)
        s_htq = jnp.einsum("bshd,btd->bsht", q.astype(jnp.float32),
                           k_keys.astype(jnp.float32)) * self.scale
        s_htq = jax.nn.relu(s_htq)
        w = self.weights_proj(params["weights_proj"], hidden).astype(jnp.float32)
        w = w * (self.n_heads ** -0.5)
        return jnp.einsum("bsh,bsht->bst", w, s_htq)


class DeepseekV32Attention(DeepseekV3Attention):
    """MLA + DSA indexer mask (reference DeepseekV32Attention:274-355)."""

    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        self.indexer = DeepseekV32Indexer(config, layer_idx, dtype=dtype,
                                          param_dtype=param_dtype)
        self.index_topk = config.index_topk

    def project_q(self, params, hidden):
        """Query path hook → (q [B,S,H,qk_head_dim], q_resid, output_gate|None).
        A.X-K2 overrides with its fused q+gate projection."""
        b, s, _ = hidden.shape
        q_resid = self.q_a_layernorm(
            params["q_a_layernorm"], self.q_a_proj(params["q_a_proj"], hidden))
        q = self.q_b_proj(params["q_b_proj"], q_resid)
        return q.reshape(b, s, self.num_heads, self.qk_head_dim), q_resid, None

    def __call__(self, params, hidden, cos, sin, attn_args,
                 cache: Optional[StaticKVCache], cache_position):
        b, s, _ = hidden.shape
        q, q_resid, out_gate = self.project_q(params, hidden)
        q_pass = q[..., : self.qk_nope_head_dim]
        q_rot = q[..., self.qk_nope_head_dim:]

        compressed = self.kv_a_proj_with_mqa(params["kv_a_proj_with_mqa"], hidden)
        kv_nope = self.kv_a_layernorm(params["kv_a_layernorm"],
                                      compressed[..., : self.kv_lora_rank])
        k_rot = compressed[..., self.kv_lora_rank:]
        q_rot, k_rot = self.apply_mla_rope(q_rot, k_rot, cos, sin)
        q = jnp.concatenate([q_pass, q_rot], axis=-1)

        idx_key = self.indexer.project_key(params["indexer"], hidden, cos, sin)

        if cache is not None:
            # one cache line per layer: [rope stream | indexer key stream]
            packed = jnp.concatenate([k_rot, idx_key.astype(k_rot.dtype)], axis=-1)
            cache = cache.update(self.layer_idx, kv_nope[:, :, None, :],
                                 packed[:, :, None, :], cache_position)
            kv_nope_full, packed_full = cache.layer(self.layer_idx)
            kv_nope = kv_nope_full[:, :, 0].astype(self.dtype)
            packed_full = packed_full[:, :, 0]
            k_rot = packed_full[..., : self.qk_rope_head_dim].astype(self.dtype)
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
        index_scores = self.indexer.scores(params["indexer"], hidden, q_resid,
                                           idx_key, cos, sin)
        index_scores = index_scores + bias[:, 0].astype(jnp.float32)
        topk = min(self.index_topk, index_scores.shape[-1])
        _, top_idx = jax.lax.top_k(index_scores, topk)  # [B, S, K]
        t = index_scores.shape[-1]
        selected = jax.nn.one_hot(top_idx, t, dtype=jnp.float32).sum(-2) > 0
        sparse = jnp.where(selected, 0.0, jnp.finfo(jnp.float32).min)
        bias = bias.astype(jnp.float32) + sparse[:, None, :, :]
        for key in ("kv_valid", "q_positions", "is_causal", "sliding_window",
                    "q_segment_ids", "kv_segment_ids", "q_block_ids",
                    "kv_block_ids", "chunk_size"):
            args.pop(key, None)

        attn_fn = get_attention_fn("eager")
        out = attn_fn(q, k, v, bias, scale=self.scale, **args)
        out = out.reshape(b, s, self.num_heads * self.v_head_dim)
        if out_gate is not None:
            # A.X-K2: input-dependent sigmoid gate in fp32 (reference
            # modular_axk2.py:330)
            out = (out.astype(jnp.float32)
                   * jax.nn.sigmoid(out_gate.astype(jnp.float32))).astype(self.dtype)
        return self.o_proj(params["o_proj"], out), cache


class DeepseekV32DecoderLayer(DeepseekV3DecoderLayer):
    attention_cls = DeepseekV32Attention


class DeepseekV32Model(DeepseekV3Model):
    decoder_layer_cls = DeepseekV32DecoderLayer


class DeepseekV32ForCausalLM(DeepseekV3ForCausalLM):
    config_class = DeepseekV32Config
    model_cls = DeepseekV32Model

    def init_cache(self, batch_size: int, max_len: int, dtype=None,
                   implementation: str = "static"):
        """V3 latent cache with the value stream widened to carry the DSA
        indexer key: [rope qk_rope_head_dim | indexer index_head_dim]."""
        cfg = self.config
        dtype = dtype or self.dtype
        keys, values = [], []
        width = cfg.qk_rope_head_dim + cfg.index_head_dim
        for _ in range(cfg.num_hidden_layers):
            keys.append(jnp.zeros((batch_size, max_len, 1, cfg.kv_lora_rank), dtype))
            values.append(jnp.zeros((batch_size, max_len, 1, width), dtype))
        return StaticKVCache(keys=tuple(keys), values=tuple(values),
                             layer_windows=(None,) * cfg.num_hidden_layers,
                             max_len=max_len)


class DeepseekV32ModelStandalone(DeepseekV3ModelStandalone):
    config_class = DeepseekV32Config
    model_cls = DeepseekV32Model
