"""TimesFM 2.5 config (reference models/timesfm2_5/modular_timesfm2_5.py:36-85)."""

from __future__ import annotations

from ..timesfm.configuration_timesfm import TimesFmConfig


class TimesFm2_5Config(TimesFmConfig):
    model_type = "timesfm_2_5"

    def __init__(self, context_length=16384, num_key_value_heads=16,
                 num_hidden_layers=20, attention_bias=False,
                 output_quantile_len=1024, decode_index=5, use_bias=False,
                 activation="swish", use_continuous_quantile_head=True,
                 force_flip_invariance=True, infer_is_positive=True,
                 max_position_embeddings=16384, rope_theta=10000.0,
                 rope_scaling=None, **kwargs):
        super().__init__(context_length=context_length,
                         num_hidden_layers=num_hidden_layers, **kwargs)
        self.num_key_value_heads = num_key_value_heads
        self.attention_bias = attention_bias
        self.output_quantile_len = output_quantile_len
        self.decode_index = decode_index
        self.use_bias = use_bias
        self.activation = activation
        self.use_continuous_quantile_head = use_continuous_quantile_head
        self.force_flip_invariance = force_flip_invariance
        self.infer_is_positive = infer_is_positive
        self.max_position_embeddings = max_position_embeddings
        self.rope_theta = rope_theta
        self.rope_scaling = rope_scaling
