"""ResNet config (reference
src/transformers/models/resnet/configuration_resnet.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class ResNetConfig(PretrainedConfig):
    model_type = "resnet"

    def __init__(
        self,
        num_channels=3,
        embedding_size=64,
        hidden_sizes=(256, 512, 1024, 2048),
        depths=(3, 4, 6, 3),
        layer_type="bottleneck",
        hidden_act="relu",
        downsample_in_first_stage=False,
        downsample_in_bottleneck=False,
        out_features=None,
        out_indices=None,
        **kwargs,
    ):
        self.num_channels = num_channels
        self.embedding_size = embedding_size
        self.hidden_sizes = list(hidden_sizes)
        self.depths = list(depths)
        self.layer_type = layer_type
        self.hidden_act = hidden_act
        self.downsample_in_first_stage = downsample_in_first_stage
        self.downsample_in_bottleneck = downsample_in_bottleneck
        self.stage_names = ["stem"] + [f"stage{i + 1}" for i in range(len(self.depths))]
        self.out_features = out_features
        self.out_indices = out_indices
        if self.out_features is None and self.out_indices is None:
            self.out_features = [self.stage_names[-1]]
        if self.out_features is None and self.out_indices is not None:
            self.out_features = [self.stage_names[i] for i in self.out_indices]
        super().__init__(**kwargs)
