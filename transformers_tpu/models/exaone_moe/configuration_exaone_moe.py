"""EXAONE-MoE config (reference
src/transformers/models/exaone_moe/modular_exaone_moe.py)."""

from __future__ import annotations

from ..exaone4.configuration_exaone4 import Exaone4Config


class ExaoneMoeConfig(Exaone4Config):
    model_type = "exaone_moe"

    def __init__(self, num_key_value_heads=32, eos_token_id=53, bos_token_id=1,
                 pad_token_id=0, mlp_layer_types=None, first_k_dense_replace=1,
                 moe_intermediate_size=1024, num_experts=64,
                 num_experts_per_tok=8, num_shared_experts=1,
                 norm_topk_prob=True, routed_scaling_factor=2.5, n_group=1,
                 topk_group=1, num_hidden_layers=32, **kwargs):
        self.first_k_dense_replace = first_k_dense_replace
        if mlp_layer_types is None:
            mlp_layer_types = ["dense" if i < first_k_dense_replace else "sparse"
                               for i in range(num_hidden_layers)]
        self.mlp_layer_types = list(mlp_layer_types)
        self.moe_intermediate_size = moe_intermediate_size
        self.num_experts = num_experts
        self.num_experts_per_tok = num_experts_per_tok
        self.num_shared_experts = num_shared_experts
        # aliases consumed by the shared DeepSeek-V3 MoE block
        self.n_routed_experts = num_experts
        self.n_shared_experts = num_shared_experts
        self.norm_topk_prob = norm_topk_prob
        self.routed_scaling_factor = routed_scaling_factor
        self.n_group = n_group
        self.topk_group = topk_group
        super().__init__(num_key_value_heads=num_key_value_heads,
                         num_hidden_layers=num_hidden_layers,
                         bos_token_id=bos_token_id, eos_token_id=eos_token_id,
                         pad_token_id=pad_token_id, **kwargs)
