"""Mask2Former config (reference
models/mask2former/configuration_mask2former.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig
from ..swin.configuration_swin import SwinConfig


class Mask2FormerConfig(PretrainedConfig):
    model_type = "mask2former"
    sub_configs = {"backbone_config": SwinConfig}

    def __init__(self, backbone_config=None, feature_size=256,
                 mask_feature_size=256, hidden_dim=256,
                 encoder_feedforward_dim=1024, activation_function="relu",
                 encoder_layers=6, decoder_layers=10, num_attention_heads=8,
                 dropout=0.0, dim_feedforward=2048, pre_norm=False,
                 enforce_input_projection=False, common_stride=4,
                 ignore_value=255, num_queries=100, no_object_weight=0.1,
                 class_weight=2.0, mask_weight=5.0, dice_weight=5.0,
                 train_num_points=12544, oversample_ratio=3.0,
                 importance_sample_ratio=0.75, init_std=0.02,
                 init_xavier_std=1.0, use_auxiliary_loss=True,
                 feature_strides=(4, 8, 16, 32), output_auxiliary_logits=None,
                 backbone=None, use_pretrained_backbone=False,
                 use_timm_backbone=False, backbone_kwargs=None, **kwargs):
        if backbone_config is None:
            backbone_config = SwinConfig(
                image_size=224, embed_dim=96, patch_size=4, window_size=7,
                depths=[2, 2, 6, 2], num_heads=[3, 6, 12, 24],
                out_features=["stage1", "stage2", "stage3", "stage4"])
        elif isinstance(backbone_config, dict):
            backbone_config = SwinConfig(**{
                k: v for k, v in backbone_config.items()
                if k not in ("model_type", "out_features", "out_indices")})
        self.backbone_config = backbone_config
        self.feature_size = feature_size
        self.mask_feature_size = mask_feature_size
        self.hidden_dim = hidden_dim
        self.encoder_feedforward_dim = encoder_feedforward_dim
        self.activation_function = activation_function
        self.encoder_layers = encoder_layers
        self.decoder_layers = decoder_layers
        self.num_attention_heads = num_attention_heads
        self.dropout = dropout
        self.dim_feedforward = dim_feedforward
        self.pre_norm = pre_norm
        self.enforce_input_projection = enforce_input_projection
        self.common_stride = common_stride
        self.ignore_value = ignore_value
        self.num_queries = num_queries
        self.no_object_weight = no_object_weight
        self.class_weight = class_weight
        self.mask_weight = mask_weight
        self.dice_weight = dice_weight
        self.train_num_points = train_num_points
        self.oversample_ratio = oversample_ratio
        self.importance_sample_ratio = importance_sample_ratio
        self.init_std = init_std
        self.init_xavier_std = init_xavier_std
        self.use_auxiliary_loss = use_auxiliary_loss
        self.feature_strides = list(feature_strides)
        self.output_auxiliary_logits = output_auxiliary_logits
        self.backbone = backbone
        self.use_pretrained_backbone = use_pretrained_backbone
        self.use_timm_backbone = use_timm_backbone
        self.backbone_kwargs = backbone_kwargs
        super().__init__(**kwargs)
