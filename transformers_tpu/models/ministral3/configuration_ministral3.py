"""Ministral3 config (reference src/transformers/models/ministral3/configuration_ministral3.py)."""

from __future__ import annotations

from ..mistral.configuration_mistral import MistralConfig


class Ministral3Config(MistralConfig):
    model_type = "ministral3"

    def __init__(self, vocab_size=131072, hidden_size=5120, intermediate_size=32768,
                 num_hidden_layers=40, num_attention_heads=32, num_key_value_heads=8,
                 head_dim=128, max_position_embeddings=262144, rope_theta=1000000.0,
                 rope_scaling=None, sliding_window=None, **kwargs):
        if rope_scaling is None and "rope_parameters" not in kwargs:
            # reference default: yarn + llama-4 position-dependent q scaling
            rope_scaling = {"rope_type": "yarn", "factor": 16.0,
                            "original_max_position_embeddings": 16384,
                            "beta_fast": 32.0, "beta_slow": 1.0,
                            "mscale_all_dim": 1.0, "mscale": 1.0,
                            "llama_4_scaling_beta": 0.1}
        super().__init__(vocab_size=vocab_size, hidden_size=hidden_size,
                         intermediate_size=intermediate_size,
                         num_hidden_layers=num_hidden_layers,
                         num_attention_heads=num_attention_heads,
                         num_key_value_heads=num_key_value_heads,
                         head_dim=head_dim,
                         max_position_embeddings=max_position_embeddings,
                         rope_theta=rope_theta, rope_scaling=rope_scaling,
                         sliding_window=sliding_window, **kwargs)
