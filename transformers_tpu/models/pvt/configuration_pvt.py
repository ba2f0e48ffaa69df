"""PVT config (reference src/transformers/models/pvt/configuration_pvt.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class PvtConfig(PretrainedConfig):
    model_type = "pvt"

    def __init__(self, image_size=224, num_channels=3, num_encoder_blocks=4,
                 depths=(2, 2, 2, 2), sequence_reduction_ratios=(8, 4, 2, 1),
                 hidden_sizes=(64, 128, 320, 512), patch_sizes=(4, 2, 2, 2),
                 strides=(4, 2, 2, 2), num_attention_heads=(1, 2, 5, 8),
                 mlp_ratios=(8, 8, 4, 4), hidden_act="gelu",
                 hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
                 initializer_range=0.02, drop_path_rate=0.0,
                 layer_norm_eps=1e-6, qkv_bias=True, **kwargs):
        self.image_size = image_size
        self.num_channels = num_channels
        self.num_encoder_blocks = num_encoder_blocks
        self.depths = list(depths)
        self.sequence_reduction_ratios = list(sequence_reduction_ratios)
        self.hidden_sizes = list(hidden_sizes)
        self.patch_sizes = list(patch_sizes)
        self.strides = list(strides)
        self.num_attention_heads = list(num_attention_heads)
        self.mlp_ratios = list(mlp_ratios)
        self.hidden_act = hidden_act
        self.hidden_dropout_prob = hidden_dropout_prob
        self.attention_probs_dropout_prob = attention_probs_dropout_prob
        self.initializer_range = initializer_range
        self.drop_path_rate = drop_path_rate
        self.layer_norm_eps = layer_norm_eps
        self.qkv_bias = qkv_bias
        super().__init__(**kwargs)
