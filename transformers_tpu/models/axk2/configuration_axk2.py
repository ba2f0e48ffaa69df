"""A.X-K2 config (reference models/axk2/modular_axk2.py:36-149): DeepSeek-V3.2
DSA geometry with a fused q+output-gate projection, low-rank gated RMSNorms,
and optionally NON-grouped routing (n_group=None, the A.X-K2-Light default)."""

from __future__ import annotations

from ..deepseek_v32.configuration_deepseek_v32 import DeepseekV32Config


class AXK2Config(DeepseekV32Config):
    model_type = "axk2"

    def __init__(self, vocab_size=163840, hidden_size=2048,
                 intermediate_size=5120, moe_intermediate_size=512,
                 num_hidden_layers=48, num_attention_heads=32,
                 num_key_value_heads=32, n_shared_experts=1,
                 n_routed_experts=128, routed_scaling_factor=2.5,
                 kv_lora_rank=128, q_lora_rank=384, qk_rope_head_dim=32,
                 v_head_dim=64, qk_nope_head_dim=64, num_experts_per_tok=8,
                 max_position_embeddings=131072, index_topk=2048,
                 index_head_dim=128, index_n_heads=16, gated_norm_rank=16,
                 n_group=None, topk_group=None, first_k_dense_replace=1,
                 **kwargs):
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
            qk_nope_head_dim=qk_nope_head_dim,
            num_experts_per_tok=num_experts_per_tok,
            max_position_embeddings=max_position_embeddings,
            index_topk=index_topk, index_head_dim=index_head_dim,
            index_n_heads=index_n_heads,
            first_k_dense_replace=first_k_dense_replace,
            # n_group=1/topk_group=1 is exactly non-grouped routing (one group
            # holding every expert); the reference keeps None and branches
            n_group=n_group if n_group is not None else 1,
            topk_group=topk_group if topk_group is not None else 1,
            **kwargs)
        self.gated_norm_rank = gated_norm_rank
