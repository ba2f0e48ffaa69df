"""RegNet config (reference src/transformers/models/regnet/configuration_regnet.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class RegNetConfig(PretrainedConfig):
    model_type = "regnet"

    def __init__(self, num_channels=3, embedding_size=32,
                 hidden_sizes=(48, 96, 192, 512), depths=(2, 6, 12, 2),
                 groups_width=16, layer_type="y", hidden_act="relu",
                 downsample_in_first_stage=False, **kwargs):
        self.num_channels = num_channels
        self.embedding_size = embedding_size
        self.hidden_sizes = list(hidden_sizes)
        self.depths = list(depths)
        self.groups_width = groups_width
        self.layer_type = layer_type
        self.hidden_act = hidden_act
        self.downsample_in_first_stage = downsample_in_first_stage
        super().__init__(**kwargs)
