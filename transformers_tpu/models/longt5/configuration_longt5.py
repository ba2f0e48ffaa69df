"""LongT5 config (reference src/transformers/models/longt5/configuration_longt5.py)."""

from __future__ import annotations

from ..t5.configuration_t5 import T5Config


class LongT5Config(T5Config):
    model_type = "longt5"

    def __init__(self, local_radius=127, global_block_size=16,
                 encoder_attention_type="local", **kwargs):
        self.local_radius = local_radius
        self.global_block_size = global_block_size
        self.encoder_attention_type = encoder_attention_type
        super().__init__(**kwargs)
