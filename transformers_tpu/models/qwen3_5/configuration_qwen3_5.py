"""Qwen3.5 text config (reference models/qwen3_5/modular_qwen3_5.py:72-140):
Qwen3-Next hybrid geometry with NO MoE (dense MLP every layer) and the
linear-attention projections factored into four Linears."""

from __future__ import annotations

from ..qwen3_next.configuration_qwen3_next import Qwen3NextConfig


class Qwen3_5Config(Qwen3NextConfig):
    model_type = "qwen3_5"

    def __init__(self, vocab_size=248320, hidden_size=4096,
                 intermediate_size=12288, num_hidden_layers=32,
                 num_key_value_heads=4, num_experts=0, rope_theta=10000.0,
                 **kwargs):
        super().__init__(
            vocab_size=vocab_size, hidden_size=hidden_size,
            intermediate_size=intermediate_size,
            num_hidden_layers=num_hidden_layers,
            num_key_value_heads=num_key_value_heads,
            num_experts=num_experts, rope_theta=rope_theta, **kwargs)
