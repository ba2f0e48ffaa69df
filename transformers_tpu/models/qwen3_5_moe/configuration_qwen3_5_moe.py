"""Qwen3.5-MoE text config (reference models/qwen3_5_moe/modular_qwen3_5_moe.py:59-123):
Qwen3-Next hybrid geometry with Qwen3.5's factored linear-attention
projections and the Qwen3-Next sparse MoE block on EVERY layer."""

from __future__ import annotations

from ..qwen3_next.configuration_qwen3_next import Qwen3NextConfig


class Qwen3_5MoeConfig(Qwen3NextConfig):
    model_type = "qwen3_5_moe"

    def __init__(self, vocab_size=248320, hidden_size=2048,
                 num_hidden_layers=40, num_experts_per_tok=8, num_experts=256,
                 rope_theta=10000.0, **kwargs):
        super().__init__(
            vocab_size=vocab_size, hidden_size=hidden_size,
            num_hidden_layers=num_hidden_layers,
            num_experts_per_tok=num_experts_per_tok, num_experts=num_experts,
            rope_theta=rope_theta, **kwargs)
