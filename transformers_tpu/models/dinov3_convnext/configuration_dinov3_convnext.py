"""DINOv3 ConvNext config (reference
models/dinov3_convnext/configuration_dinov3_convnext.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class DINOv3ConvNextConfig(PretrainedConfig):
    model_type = "dinov3_convnext"

    def __init__(self, num_channels=3, hidden_sizes=None, depths=None,
                 hidden_act="gelu", initializer_range=0.02, layer_norm_eps=1e-6,
                 layer_scale_init_value=1e-6, drop_path_rate=0.0,
                 image_size=224, **kwargs):
        super().__init__(**kwargs)
        self.num_channels = num_channels
        self.hidden_sizes = hidden_sizes if hidden_sizes is not None else [96, 192, 384, 768]
        self.depths = depths if depths is not None else [3, 3, 9, 3]
        self.hidden_act = hidden_act
        self.initializer_range = initializer_range
        self.layer_norm_eps = layer_norm_eps
        self.layer_scale_init_value = layer_scale_init_value
        self.drop_path_rate = drop_path_rate
        self.image_size = image_size

    @property
    def num_stages(self):
        return len(self.depths)

    @property
    def stage_names(self):
        return ["stem"] + [f"stage{i}" for i in range(1, len(self.depths) + 1)]
