"""ConvNeXt config (reference
src/transformers/models/convnext/configuration_convnext.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class ConvNextConfig(PretrainedConfig):
    model_type = "convnext"

    def __init__(
        self,
        num_channels=3,
        patch_size=4,
        num_stages=4,
        hidden_sizes=(96, 192, 384, 768),
        depths=(3, 3, 9, 3),
        hidden_act="gelu",
        initializer_range=0.02,
        layer_norm_eps=1e-12,
        layer_scale_init_value=1e-6,
        drop_path_rate=0.0,
        out_features=None,
        out_indices=None,
        **kwargs,
    ):
        self.num_channels = num_channels
        self.patch_size = patch_size
        self.num_stages = num_stages
        self.hidden_sizes = list(hidden_sizes)
        self.depths = list(depths)
        self.hidden_act = hidden_act
        self.initializer_range = initializer_range
        self.layer_norm_eps = layer_norm_eps
        self.layer_scale_init_value = layer_scale_init_value
        self.drop_path_rate = drop_path_rate
        self.stage_names = ["stem"] + [f"stage{i}" for i in range(1, len(self.depths) + 1)]
        self.out_features = out_features
        self.out_indices = out_indices
        super().__init__(**kwargs)
