"""Mellum config (reference models/mellum/modular_mellum.py:40-95):
Qwen3-MoE geometry with Laguna-style per-layer-type rope tables and
per-layer dense/sparse MLP selection."""

from __future__ import annotations

from ..qwen3_moe.configuration_qwen3_moe import Qwen3MoeConfig


class MellumConfig(Qwen3MoeConfig):
    model_type = "mellum"

    def __init__(self, vocab_size=98304, hidden_size=2304,
                 intermediate_size=7168, num_hidden_layers=28, head_dim=128,
                 max_position_embeddings=131072, sliding_window=1024,
                 num_experts=64, moe_intermediate_size=896,
                 norm_topk_prob=True, layer_types=None, mlp_layer_types=None,
                 rope_parameters=None, **kwargs):
        super().__init__(
            vocab_size=vocab_size, hidden_size=hidden_size,
            intermediate_size=intermediate_size,
            num_hidden_layers=num_hidden_layers, head_dim=head_dim,
            max_position_embeddings=max_position_embeddings,
            sliding_window=sliding_window, num_experts=num_experts,
            moe_intermediate_size=moe_intermediate_size,
            norm_topk_prob=norm_topk_prob, **kwargs)
        self.layer_types = layer_types or ["full_attention"] * num_hidden_layers
        self.mlp_layer_types = mlp_layer_types or ["sparse"] * num_hidden_layers
        self.rope_parameters = rope_parameters or {
            "full_attention": {"rope_type": "default", "rope_theta": 500000.0},
            "sliding_attention": {"rope_type": "default", "rope_theta": 10000.0},
        }
