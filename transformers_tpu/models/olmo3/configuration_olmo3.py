"""OLMo3 config (reference src/transformers/models/olmo3/modular_olmo3.py)."""

from __future__ import annotations

from ..olmo2.configuration_olmo2 import Olmo2Config


class Olmo3Config(Olmo2Config):
    model_type = "olmo3"

    def __init__(self, sliding_window=4096, layer_types=None, rope_theta=500000.0,
                 **kwargs):
        super().__init__(rope_theta=rope_theta, **kwargs)
        self.sliding_window = sliding_window
        if layer_types is None:
            # 3 of 4 layers sliding (reference modular_olmo3.py __post_init__)
            layer_types = ["sliding_attention" if (i + 1) % 4 != 0 else "full_attention"
                           for i in range(self.num_hidden_layers)]
        self.layer_types = layer_types
