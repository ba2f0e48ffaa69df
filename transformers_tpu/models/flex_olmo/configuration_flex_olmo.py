"""FlexOlmo config (reference src/transformers/models/flex_olmo/modular_flex_olmo.py)."""

from __future__ import annotations

from ..olmo2.configuration_olmo2 import Olmo2Config


class FlexOlmoConfig(Olmo2Config):
    model_type = "flex_olmo"

    def __init__(self, num_experts_per_tok=5, num_experts=7, norm_topk_prob=False,
                 output_router_logits=False, router_aux_loss_coef=0.01,
                 rope_theta=500000.0, **kwargs):
        super().__init__(rope_theta=rope_theta, **kwargs)
        self.num_experts_per_tok = num_experts_per_tok
        self.num_experts = num_experts
        self.norm_topk_prob = norm_topk_prob
        self.output_router_logits = output_router_logits
        self.router_aux_loss_coef = router_aux_loss_coef
