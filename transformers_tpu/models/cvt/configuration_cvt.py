"""CvT config (reference src/transformers/models/cvt/configuration_cvt.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class CvtConfig(PretrainedConfig):
    model_type = "cvt"

    def __init__(self, num_channels=3, patch_sizes=(7, 3, 3),
                 patch_stride=(4, 2, 2), patch_padding=(2, 1, 1),
                 embed_dim=(64, 192, 384), num_heads=(1, 3, 6),
                 depth=(1, 2, 10), mlp_ratio=(4.0, 4.0, 4.0),
                 attention_drop_rate=(0.0, 0.0, 0.0), drop_rate=(0.0, 0.0, 0.0),
                 drop_path_rate=(0.0, 0.0, 0.1), qkv_bias=(True, True, True),
                 cls_token=(False, False, True),
                 qkv_projection_method=("dw_bn", "dw_bn", "dw_bn"),
                 kernel_qkv=(3, 3, 3), padding_kv=(1, 1, 1),
                 stride_kv=(2, 2, 2), padding_q=(1, 1, 1), stride_q=(1, 1, 1),
                 initializer_range=0.02, layer_norm_eps=1e-12, **kwargs):
        self.num_channels = num_channels
        self.patch_sizes = list(patch_sizes)
        self.patch_stride = list(patch_stride)
        self.patch_padding = list(patch_padding)
        self.embed_dim = list(embed_dim)
        self.num_heads = list(num_heads)
        self.depth = list(depth)
        self.mlp_ratio = list(mlp_ratio)
        self.attention_drop_rate = list(attention_drop_rate)
        self.drop_rate = list(drop_rate)
        self.drop_path_rate = list(drop_path_rate)
        self.qkv_bias = list(qkv_bias)
        self.cls_token = list(cls_token)
        self.qkv_projection_method = list(qkv_projection_method)
        self.kernel_qkv = list(kernel_qkv)
        self.padding_kv = list(padding_kv)
        self.stride_kv = list(stride_kv)
        self.padding_q = list(padding_q)
        self.stride_q = list(stride_q)
        self.initializer_range = initializer_range
        self.layer_norm_eps = layer_norm_eps
        super().__init__(**kwargs)
