"""GLM-4-MoE-Lite config (reference
src/transformers/models/glm4_moe_lite/modular_glm4_moe_lite.py)."""

from __future__ import annotations

from ..deepseek_v3.configuration_deepseek_v3 import DeepseekV3Config


class Glm4MoeLiteConfig(DeepseekV3Config):
    model_type = "glm4_moe_lite"
    attribute_map = {"num_local_experts": "n_routed_experts",
                     "head_dim": "qk_rope_head_dim"}

    def __init__(self, vocab_size=154880, hidden_size=2048, intermediate_size=10240,
                 moe_intermediate_size=1536, num_hidden_layers=47,
                 num_attention_heads=20, num_key_value_heads=20,
                 n_shared_experts=1, n_routed_experts=64,
                 routed_scaling_factor=1.8, kv_lora_rank=512, q_lora_rank=768,
                 qk_rope_head_dim=64, v_head_dim=256, qk_nope_head_dim=192,
                 n_group=1, topk_group=1, num_experts_per_tok=4,
                 norm_topk_prob=True, max_position_embeddings=202752,
                 rms_norm_eps=1e-5, bos_token_id=0, eos_token_id=1,
                 mlp_layer_types=None, **kwargs):
        if mlp_layer_types is None:
            # dense first layer, MoE from the second on
            mlp_layer_types = ["dense"] + ["sparse"] * (num_hidden_layers - 1)
        self.mlp_layer_types = list(mlp_layer_types)
        super().__init__(vocab_size=vocab_size, hidden_size=hidden_size,
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
                         topk_group=topk_group,
                         num_experts_per_tok=num_experts_per_tok,
                         norm_topk_prob=norm_topk_prob,
                         max_position_embeddings=max_position_embeddings,
                         rms_norm_eps=rms_norm_eps, bos_token_id=bos_token_id,
                         eos_token_id=eos_token_id, **kwargs)
