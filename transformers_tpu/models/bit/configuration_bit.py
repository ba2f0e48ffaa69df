"""BiT config (reference src/transformers/models/bit/configuration_bit.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class BitConfig(PretrainedConfig):
    model_type = "bit"

    def __init__(self, num_channels=3, embedding_size=64,
                 hidden_sizes=(256, 512, 1024, 2048), depths=(3, 4, 6, 3),
                 layer_type="preactivation", hidden_act="relu",
                 global_padding=None, num_groups=32, drop_path_rate=0.0,
                 embedding_dynamic_padding=False, output_stride=32,
                 width_factor=1, **kwargs):
        self.num_channels = num_channels
        self.embedding_size = embedding_size
        self.hidden_sizes = list(hidden_sizes)
        self.depths = list(depths)
        self.layer_type = layer_type
        self.hidden_act = hidden_act
        self.global_padding = global_padding
        self.num_groups = num_groups
        self.drop_path_rate = drop_path_rate
        self.embedding_dynamic_padding = embedding_dynamic_padding
        self.output_stride = output_stride
        self.width_factor = width_factor
        super().__init__(**kwargs)
