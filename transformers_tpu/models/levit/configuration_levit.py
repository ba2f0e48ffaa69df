"""LeViT config (reference src/transformers/models/levit/configuration_levit.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class LevitConfig(PretrainedConfig):
    model_type = "levit"

    def __init__(self, image_size=224, num_channels=3, kernel_size=3, stride=2,
                 padding=1, patch_size=16, hidden_sizes=(128, 256, 384),
                 num_attention_heads=(4, 8, 12), depths=(4, 4, 4),
                 key_dim=(16, 16, 16), drop_path_rate=0, mlp_ratio=(2, 2, 2),
                 attention_ratio=(2, 2, 2), initializer_range=0.02, **kwargs):
        self.image_size = image_size
        self.num_channels = num_channels
        self.kernel_size = kernel_size
        self.stride = stride
        self.padding = padding
        self.patch_size = patch_size
        self.hidden_sizes = list(hidden_sizes)
        self.num_attention_heads = list(num_attention_heads)
        self.depths = list(depths)
        self.key_dim = list(key_dim)
        self.drop_path_rate = drop_path_rate
        self.mlp_ratio = list(mlp_ratio)
        self.attention_ratio = list(attention_ratio)
        self.initializer_range = initializer_range
        # reference configuration_levit.py:68 builds the down-sampling specs
        # from key_dim/hidden_sizes in __post_init__.
        self.down_ops = [
            ["Subsample", self.key_dim[0],
             self.hidden_sizes[0] // self.key_dim[0], 4, 2, 2],
            ["Subsample", self.key_dim[0],
             self.hidden_sizes[1] // self.key_dim[0], 4, 2, 2],
        ]
        super().__init__(**kwargs)
