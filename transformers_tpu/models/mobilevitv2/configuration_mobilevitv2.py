"""MobileViTV2 config (reference
src/transformers/models/mobilevitv2/configuration_mobilevitv2.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class MobileViTV2Config(PretrainedConfig):
    model_type = "mobilevitv2"

    def __init__(self, num_channels=3, image_size=256, patch_size=2,
                 expand_ratio=2.0, hidden_act="swish", conv_kernel_size=3,
                 output_stride=32, classifier_dropout_prob=0.1,
                 initializer_range=0.02, layer_norm_eps=1e-5,
                 aspp_out_channels=512, atrous_rates=(6, 12, 18),
                 aspp_dropout_prob=0.1, semantic_loss_ignore_index=255,
                 n_attn_blocks=(2, 4, 3), base_attn_unit_dims=(128, 192, 256),
                 width_multiplier=1.0, ffn_multiplier=2, attn_dropout=0.0,
                 ffn_dropout=0.0, **kwargs):
        super().__init__(**kwargs)
        self.num_channels = num_channels
        self.image_size = image_size
        self.patch_size = patch_size
        self.expand_ratio = expand_ratio
        self.hidden_act = hidden_act
        self.conv_kernel_size = conv_kernel_size
        self.output_stride = output_stride
        self.classifier_dropout_prob = classifier_dropout_prob
        self.initializer_range = initializer_range
        self.layer_norm_eps = layer_norm_eps
        self.aspp_out_channels = aspp_out_channels
        self.atrous_rates = list(atrous_rates)
        self.aspp_dropout_prob = aspp_dropout_prob
        self.semantic_loss_ignore_index = semantic_loss_ignore_index
        self.n_attn_blocks = list(n_attn_blocks)
        self.base_attn_unit_dims = list(base_attn_unit_dims)
        self.width_multiplier = width_multiplier
        self.ffn_multiplier = ffn_multiplier
        self.attn_dropout = attn_dropout
        self.ffn_dropout = ffn_dropout
