"""LFM2-MoE config (reference
src/transformers/models/lfm2_moe/configuration_lfm2_moe.py)."""

from __future__ import annotations

from ..lfm2.modeling_lfm2 import Lfm2Config


class Lfm2MoeConfig(Lfm2Config):
    model_type = "lfm2_moe"

    def __init__(self, vocab_size=65536, hidden_size=2048, intermediate_size=7168,
                 moe_intermediate_size=1792, num_hidden_layers=32,
                 num_attention_heads=32, num_key_value_heads=8,
                 num_dense_layers=2, num_experts_per_tok=4, num_experts=32,
                 use_expert_bias=True, routed_scaling_factor=1.0,
                 norm_topk_prob=True, pad_token_id=0, bos_token_id=1,
                 eos_token_id=2, **kwargs):
        self.moe_intermediate_size = moe_intermediate_size
        self.num_dense_layers = num_dense_layers
        self.num_experts_per_tok = num_experts_per_tok
        self.num_experts = num_experts
        self.use_expert_bias = use_expert_bias
        self.routed_scaling_factor = routed_scaling_factor
        self.norm_topk_prob = norm_topk_prob
        # dense layers use intermediate_size verbatim (reference Lfm2MoeMLP
        # bypasses LFM2's block_auto_adjust_ff_dim rounding)
        kwargs.setdefault("block_auto_adjust_ff_dim", False)
        super().__init__(vocab_size=vocab_size, hidden_size=hidden_size,
                         intermediate_size=intermediate_size,
                         num_hidden_layers=num_hidden_layers,
                         num_attention_heads=num_attention_heads,
                         num_key_value_heads=num_key_value_heads,
                         pad_token_id=pad_token_id, bos_token_id=bos_token_id,
                         eos_token_id=eos_token_id, **kwargs)
