"""PoolFormer config (reference src/transformers/models/poolformer/configuration_poolformer.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class PoolFormerConfig(PretrainedConfig):
    model_type = "poolformer"

    def __init__(self, num_channels=3, patch_size=16, stride=16, pool_size=3,
                 mlp_ratio=4.0, depths=(2, 2, 6, 2),
                 hidden_sizes=(64, 128, 320, 512), patch_sizes=(7, 3, 3, 3),
                 strides=(4, 2, 2, 2), padding=(2, 1, 1, 1),
                 num_encoder_blocks=4, drop_path_rate=0.0, hidden_act="gelu",
                 use_layer_scale=True, layer_scale_init_value=1e-5,
                 initializer_range=0.02, **kwargs):
        self.num_channels = num_channels
        self.patch_size = patch_size
        self.stride = stride
        self.pool_size = pool_size
        self.mlp_ratio = mlp_ratio
        self.depths = list(depths)
        self.hidden_sizes = list(hidden_sizes)
        self.patch_sizes = list(patch_sizes)
        self.strides = list(strides)
        self.padding = list(padding)
        self.num_encoder_blocks = num_encoder_blocks
        self.drop_path_rate = drop_path_rate
        self.hidden_act = hidden_act
        self.use_layer_scale = use_layer_scale
        self.layer_scale_init_value = layer_scale_init_value
        self.initializer_range = initializer_range
        super().__init__(**kwargs)
