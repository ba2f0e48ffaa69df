"""EXAONE-4 config (reference src/transformers/models/exaone4/configuration_exaone4.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class Exaone4Config(PretrainedConfig):
    model_type = "exaone4"

    def __init__(self, vocab_size=102400, hidden_size=4096, intermediate_size=16384,
                 num_hidden_layers=32, num_attention_heads=32, num_key_value_heads=8,
                 hidden_act="silu", max_position_embeddings=2048, initializer_range=0.02,
                 rms_norm_eps=1e-5, use_cache=True, bos_token_id=0, eos_token_id=2,
                 tie_word_embeddings=False, rope_theta=10000.0, attention_dropout=0.0,
                 sliding_window=4096, sliding_window_pattern=4, layer_types=None,
                 head_dim=None, **kwargs):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.intermediate_size = intermediate_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.num_key_value_heads = num_key_value_heads
        self.hidden_act = hidden_act
        self.max_position_embeddings = max_position_embeddings
        self.initializer_range = initializer_range
        self.rms_norm_eps = rms_norm_eps
        self.use_cache = use_cache
        self.rope_theta = rope_theta
        self.attention_dropout = attention_dropout
        self.sliding_window = sliding_window
        self.sliding_window_pattern = sliding_window_pattern
        self.head_dim = head_dim or hidden_size // num_attention_heads
        self.layer_types = layer_types
        if self.layer_types is None:
            # "LLLG" / int(4): every Nth layer global (reference __post_init__)
            pattern = sliding_window_pattern
            if isinstance(pattern, int):
                pattern = "L" * (pattern - 1) + "G"
            if sliding_window is None or not pattern:
                self.layer_types = ["full_attention"] * num_hidden_layers
            else:
                self.layer_types = [
                    "sliding_attention" if pattern[i % len(pattern)] == "L" else "full_attention"
                    for i in range(num_hidden_layers)
                ]
        super().__init__(bos_token_id=bos_token_id, eos_token_id=eos_token_id,
                         tie_word_embeddings=tie_word_embeddings, **kwargs)
