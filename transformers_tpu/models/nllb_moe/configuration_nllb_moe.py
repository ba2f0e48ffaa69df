"""NLLB-MoE config (reference src/transformers/models/nllb_moe/configuration_nllb_moe.py)."""

from __future__ import annotations

from ..bart.configuration_bart import BartConfig


class NllbMoeConfig(BartConfig):
    model_type = "nllb-moe"

    def __init__(self, num_experts=128, expert_capacity=64, encoder_sparse_step=4,
                 decoder_sparse_step=4, router_bias=False, router_dtype="float32",
                 router_ignore_padding_tokens=False, second_expert_policy="all",
                 normalize_router_prob_before_dropping=False,
                 batch_prioritized_routing=False,
                 moe_eval_capacity_token_fraction=1.0, moe_token_dropout=0.2,
                 router_z_loss_coef=0.001, router_aux_loss_coef=0.001,
                 output_router_logits=False, **kwargs):
        self.num_experts = num_experts
        self.expert_capacity = expert_capacity
        self.encoder_sparse_step = encoder_sparse_step
        self.decoder_sparse_step = decoder_sparse_step
        self.router_bias = router_bias
        self.router_dtype = router_dtype
        self.router_ignore_padding_tokens = router_ignore_padding_tokens
        self.second_expert_policy = second_expert_policy
        self.normalize_router_prob_before_dropping = normalize_router_prob_before_dropping
        self.batch_prioritized_routing = batch_prioritized_routing
        self.moe_eval_capacity_token_fraction = moe_eval_capacity_token_fraction
        self.moe_token_dropout = moe_token_dropout
        self.router_z_loss_coef = router_z_loss_coef
        self.router_aux_loss_coef = router_aux_loss_coef
        self.output_router_logits = output_router_logits
        super().__init__(**kwargs)
