"""GLM-MoE-DSA (GLM-5) config (reference
models/glm_moe_dsa/modular_glm_moe_dsa.py:30): DeepSeek-V3.2 sparse attention
with per-layer indexer sharing ("full" runs the indexer, "shared" reuses the
previous full layer's top-k)."""

from __future__ import annotations

from ..deepseek_v32.configuration_deepseek_v32 import DeepseekV32Config


class GlmMoeDsaConfig(DeepseekV32Config):
    model_type = "glm_moe_dsa"

    def __init__(self, vocab_size=154880, hidden_size=6144,
                 intermediate_size=12288, moe_intermediate_size=2048,
                 num_hidden_layers=78, num_attention_heads=64,
                 num_key_value_heads=64, n_shared_experts=1,
                 n_routed_experts=256, routed_scaling_factor=2.5,
                 kv_lora_rank=512, q_lora_rank=2048, qk_rope_head_dim=64,
                 v_head_dim=256, qk_nope_head_dim=192, n_group=1,
                 topk_group=1, num_experts_per_tok=8,
                 first_k_dense_replace=3, index_topk=2048, index_head_dim=128,
                 index_n_heads=32, indexer_types=None, index_topk_pattern=None,
                 index_topk_freq=1, index_skip_topk_offset=2, **kwargs):
        super().__init__(
            vocab_size=vocab_size, hidden_size=hidden_size,
            intermediate_size=intermediate_size,
            moe_intermediate_size=moe_intermediate_size,
            num_hidden_layers=num_hidden_layers,
            num_attention_heads=num_attention_heads,
            num_key_value_heads=num_key_value_heads,
            n_shared_experts=n_shared_experts,
            n_routed_experts=n_routed_experts,
            routed_scaling_factor=routed_scaling_factor,
            kv_lora_rank=kv_lora_rank, q_lora_rank=q_lora_rank,
            qk_rope_head_dim=qk_rope_head_dim, v_head_dim=v_head_dim,
            qk_nope_head_dim=qk_nope_head_dim, n_group=n_group,
            topk_group=topk_group, num_experts_per_tok=num_experts_per_tok,
            first_k_dense_replace=first_k_dense_replace,
            index_topk=index_topk, index_head_dim=index_head_dim,
            index_n_heads=index_n_heads, **kwargs)
        if indexer_types is None:
            if index_topk_pattern is not None:
                indexer_types = (
                    [{"F": "full", "S": "shared"}[c] for c in index_topk_pattern]
                    if isinstance(index_topk_pattern, str)
                    else list(index_topk_pattern))
            else:
                freq = max(index_topk_freq, 1)
                off = index_skip_topk_offset
                indexer_types = [
                    "full" if (max(i - off + 1, 0) % freq) == 0 else "shared"
                    for i in range(num_hidden_layers)]
        self.indexer_types = indexer_types
