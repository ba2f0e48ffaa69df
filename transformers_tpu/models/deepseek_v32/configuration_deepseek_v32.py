"""DeepSeek-V3.2 config (reference
models/deepseek_v32/modular_deepseek_v32.py:60-165): DeepSeek-V3 MLA + MoE
geometry plus the DSA sparse-attention indexer knobs."""

from __future__ import annotations

from ..deepseek_v3.configuration_deepseek_v3 import DeepseekV3Config


class DeepseekV32Config(DeepseekV3Config):
    model_type = "deepseek_v32"

    def __init__(self, vocab_size=129280, hidden_size=7168,
                 intermediate_size=18432, moe_intermediate_size=2048,
                 num_hidden_layers=61, num_attention_heads=128,
                 num_key_value_heads=128, n_shared_experts=1,
                 n_routed_experts=256, routed_scaling_factor=2.5,
                 kv_lora_rank=512, q_lora_rank=1536, qk_rope_head_dim=64,
                 v_head_dim=128, qk_nope_head_dim=128, n_group=8,
                 topk_group=4, num_experts_per_tok=8, first_k_dense_replace=3,
                 index_topk=2048, index_head_dim=128, index_n_heads=64,
                 rope_interleave=True, **kwargs):
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
            rope_interleave=rope_interleave, **kwargs)
        self.index_topk = index_topk
        self.index_head_dim = index_head_dim
        self.index_n_heads = index_n_heads
