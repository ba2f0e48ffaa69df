"""EfficientNet config (reference src/transformers/models/efficientnet/configuration_efficientnet.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class EfficientNetConfig(PretrainedConfig):
    model_type = "efficientnet"

    def __init__(self, num_channels=3, image_size=600, width_coefficient=2.0,
                 depth_coefficient=3.1, depth_divisor=8,
                 kernel_sizes=(3, 3, 5, 3, 5, 5, 3),
                 in_channels=(32, 16, 24, 40, 80, 112, 192),
                 out_channels=(16, 24, 40, 80, 112, 192, 320),
                 depthwise_padding=(), strides=(1, 2, 2, 2, 1, 2, 1),
                 num_block_repeats=(1, 2, 2, 3, 3, 4, 1),
                 expand_ratios=(1, 6, 6, 6, 6, 6, 6), squeeze_expansion_ratio=0.25,
                 hidden_act="swish", hidden_dim=2560, pooling_type="mean",
                 initializer_range=0.02, batch_norm_eps=0.001,
                 batch_norm_momentum=0.99, dropout_rate=0.5, drop_connect_rate=0.2,
                 **kwargs):
        self.num_channels = num_channels
        self.image_size = image_size
        self.width_coefficient = width_coefficient
        self.depth_coefficient = depth_coefficient
        self.depth_divisor = depth_divisor
        self.kernel_sizes = list(kernel_sizes)
        self.in_channels = list(in_channels)
        self.out_channels = list(out_channels)
        self.depthwise_padding = list(depthwise_padding)
        self.strides = list(strides)
        self.num_block_repeats = list(num_block_repeats)
        self.expand_ratios = list(expand_ratios)
        self.squeeze_expansion_ratio = squeeze_expansion_ratio
        self.hidden_act = hidden_act
        self.hidden_dim = hidden_dim
        self.pooling_type = pooling_type
        self.initializer_range = initializer_range
        self.batch_norm_eps = batch_norm_eps
        self.batch_norm_momentum = batch_norm_momentum
        self.dropout_rate = dropout_rate
        self.drop_connect_rate = drop_connect_rate
        super().__init__(**kwargs)
