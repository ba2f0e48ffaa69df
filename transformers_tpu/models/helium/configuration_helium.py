"""Helium config (reference src/transformers/models/helium/configuration_helium.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class HeliumConfig(PretrainedConfig):
    model_type = "helium"

    def __init__(self, vocab_size=48000, hidden_size=2560, intermediate_size=7040,
                 num_hidden_layers=24, num_attention_heads=20, num_key_value_heads=20,
                 head_dim=128, hidden_act="silu", attention_dropout=0.0,
                 max_position_embeddings=4096, initializer_range=0.02, rms_norm_eps=1e-8,
                 use_cache=True, tie_word_embeddings=False, rope_theta=100000.0,
                 attention_bias=False, mlp_bias=False, pad_token_id=3, eos_token_id=2,
                 bos_token_id=1, **kwargs):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.intermediate_size = intermediate_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.num_key_value_heads = num_key_value_heads
        self.head_dim = head_dim
        self.hidden_act = hidden_act
        self.attention_dropout = attention_dropout
        self.max_position_embeddings = max_position_embeddings
        self.initializer_range = initializer_range
        self.rms_norm_eps = rms_norm_eps
        self.use_cache = use_cache
        self.rope_theta = rope_theta
        self.attention_bias = attention_bias
        self.mlp_bias = mlp_bias
        super().__init__(pad_token_id=pad_token_id, bos_token_id=bos_token_id,
                         eos_token_id=eos_token_id, tie_word_embeddings=tie_word_embeddings,
                         **kwargs)
