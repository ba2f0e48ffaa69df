"""Youtu config (reference src/transformers/models/youtu/modular_youtu.py)."""

from __future__ import annotations

from ..deepseek_v3.configuration_deepseek_v3 import DeepseekV3Config


class YoutuConfig(DeepseekV3Config):
    model_type = "youtu"

    def __init__(self, vocab_size=128256, hidden_size=2048, intermediate_size=6144,
                 num_hidden_layers=32, num_attention_heads=16,
                 num_key_value_heads=16, max_position_embeddings=131072,
                 initializer_range=None, embedding_initializer_range=None,
                 bos_token_id=128000, eos_token_id=128001,
                 tie_word_embeddings=True, **kwargs):
        # muP-style init scales (reference __post_init__)
        if initializer_range is None:
            initializer_range = 2.0 / (5.0 * hidden_size) ** 0.5 if hidden_size else 0.02
        self.embedding_initializer_range = (embedding_initializer_range
                                            or 2.0 * initializer_range)
        super().__init__(vocab_size=vocab_size, hidden_size=hidden_size,
                         intermediate_size=intermediate_size,
                         num_hidden_layers=num_hidden_layers,
                         num_attention_heads=num_attention_heads,
                         num_key_value_heads=num_key_value_heads,
                         max_position_embeddings=max_position_embeddings,
                         initializer_range=initializer_range,
                         bos_token_id=bos_token_id, eos_token_id=eos_token_id,
                         tie_word_embeddings=tie_word_embeddings, **kwargs)
