"""VitDet config (reference models/vitdet/configuration_vitdet.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class VitDetConfig(PretrainedConfig):
    model_type = "vitdet"

    def __init__(self, hidden_size=768, num_hidden_layers=12,
                 num_attention_heads=12, mlp_ratio=4, hidden_act="gelu",
                 dropout_prob=0.0, initializer_range=0.02, layer_norm_eps=1e-6,
                 image_size=224, pretrain_image_size=224, patch_size=16,
                 num_channels=3, qkv_bias=True, drop_path_rate=0.0,
                 window_block_indices=(), residual_block_indices=(),
                 use_absolute_position_embeddings=True,
                 use_relative_position_embeddings=False, window_size=0,
                 out_features=None, out_indices=None, **kwargs):
        self.hidden_size = hidden_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.mlp_ratio = mlp_ratio
        self.hidden_act = hidden_act
        self.dropout_prob = dropout_prob
        self.initializer_range = initializer_range
        self.layer_norm_eps = layer_norm_eps
        self.image_size = image_size
        self.pretrain_image_size = pretrain_image_size
        self.patch_size = patch_size
        self.num_channels = num_channels
        self.qkv_bias = qkv_bias
        self.drop_path_rate = drop_path_rate
        self.window_block_indices = list(window_block_indices)
        self.residual_block_indices = list(residual_block_indices)
        self.use_absolute_position_embeddings = use_absolute_position_embeddings
        self.use_relative_position_embeddings = use_relative_position_embeddings
        self.window_size = window_size
        self.stage_names = ["stem"] + [f"stage{i}" for i in
                                       range(1, num_hidden_layers + 1)]
        self.out_features = out_features or [self.stage_names[-1]]
        self.out_indices = out_indices
        super().__init__(**kwargs)
