"""GraniteMoeSWA config (reference src/transformers/models/granitemoe_swa/modular_granitemoe_swa.py)."""

from __future__ import annotations

from ..granitemoeshared.configuration_granitemoeshared import GraniteMoeSharedConfig


class GraniteMoeSWAConfig(GraniteMoeSharedConfig):
    model_type = "granitemoe_swa"

    def __init__(self, shared_intermediate_size=0, sliding_window=128,
                 layer_types=None, layer_rope_theta=None, **kwargs):
        super().__init__(shared_intermediate_size=shared_intermediate_size, **kwargs)
        self.sliding_window = sliding_window
        if layer_types is None:
            layer_types = ["full_attention" if i % 4 == 0 else "sliding_attention"
                           for i in range(self.num_hidden_layers)]
        self.layer_types = layer_types
        if layer_rope_theta is None:
            layer_rope_theta = [self.rope_theta] * self.num_hidden_layers
        self.layer_rope_theta = layer_rope_theta
