"""A.X-K1 config (reference models/axk1/modular_axk1.py:50-105): DeepSeek-V3
MLA+MoE at SK Telecom's geometry."""

from __future__ import annotations

from ..deepseek_v3.configuration_deepseek_v3 import DeepseekV3Config


class AXK1Config(DeepseekV3Config):
    model_type = "axk1"

    def __init__(self, vocab_size=163840, hidden_size=7168,
                 intermediate_size=18432, moe_intermediate_size=2048,
                 num_hidden_layers=61, num_attention_heads=64,
                 num_key_value_heads=64, n_shared_experts=1,
                 n_routed_experts=192, routed_scaling_factor=2.5,
                 kv_lora_rank=512, q_lora_rank=1536, qk_rope_head_dim=64,
                 v_head_dim=128, qk_nope_head_dim=128, n_group=8,
                 topk_group=4, num_experts_per_tok=8, first_k_dense_replace=1,
                 max_position_embeddings=32768, **kwargs):
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
            max_position_embeddings=max_position_embeddings, **kwargs)
