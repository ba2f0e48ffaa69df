"""Pixtral vision config (reference src/transformers/models/pixtral/configuration_pixtral.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class PixtralVisionConfig(PretrainedConfig):
    model_type = "pixtral"

    def __init__(self, hidden_size=1024, intermediate_size=4096, num_hidden_layers=24,
                 num_attention_heads=16, num_channels=3, image_size=1024, patch_size=16,
                 hidden_act="gelu", attention_dropout=0.0, rope_theta=10000.0,
                 initializer_range=0.02, head_dim=None, **kwargs):
        self.hidden_size = hidden_size
        self.intermediate_size = intermediate_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.num_channels = num_channels
        self.image_size = image_size
        self.patch_size = patch_size
        self.hidden_act = hidden_act
        self.attention_dropout = attention_dropout
        self.rope_theta = rope_theta
        self.initializer_range = initializer_range
        self.head_dim = head_dim if head_dim is not None else hidden_size // num_attention_heads
        super().__init__(**kwargs)
