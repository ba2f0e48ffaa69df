"""Ministral config (reference src/transformers/models/ministral/modular_ministral.py)."""

from __future__ import annotations

from ..mistral.configuration_mistral import MistralConfig


class MinistralConfig(MistralConfig):
    model_type = "ministral"

    def __init__(self, layer_types=None, **kwargs):
        super().__init__(**kwargs)
        if layer_types is None:
            layer_types = ["sliding_attention" if self.sliding_window is not None
                           else "full_attention"] * self.num_hidden_layers
        self.layer_types = layer_types
