"""MaskFormer config (reference models/maskformer/configuration_maskformer.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig
from ..detr.configuration_detr import DetrConfig
from ..swin.configuration_swin import SwinConfig


class MaskFormerConfig(PretrainedConfig):
    model_type = "maskformer"
    sub_configs = {"backbone_config": SwinConfig, "decoder_config": DetrConfig}

    def __init__(self, fpn_feature_size=256, mask_feature_size=256,
                 no_object_weight=0.1, use_auxiliary_loss=False,
                 backbone_config=None, decoder_config=None, init_std=0.02,
                 init_xavier_std=1.0, dice_weight=1.0,
                 cross_entropy_weight=1.0, mask_weight=20.0,
                 output_auxiliary_logits=None, backbone=None,
                 use_pretrained_backbone=False, use_timm_backbone=False,
                 backbone_kwargs=None, **kwargs):
        if backbone_config is None:
            backbone_config = SwinConfig(
                image_size=384, embed_dim=128, patch_size=4, window_size=12,
                depths=[2, 2, 18, 2], num_heads=[4, 8, 16, 32],
                out_features=["stage1", "stage2", "stage3", "stage4"])
        elif isinstance(backbone_config, dict):
            backbone_config = SwinConfig(**{
                k: v for k, v in backbone_config.items()
                if k not in ("model_type", "out_features", "out_indices")})
        if decoder_config is None:
            decoder_config = DetrConfig()
        elif isinstance(decoder_config, dict):
            decoder_config = DetrConfig(**{
                k: v for k, v in decoder_config.items() if k != "model_type"})
        self.backbone_config = backbone_config
        self.decoder_config = decoder_config
        self.fpn_feature_size = fpn_feature_size
        self.mask_feature_size = mask_feature_size
        self.no_object_weight = no_object_weight
        self.use_auxiliary_loss = use_auxiliary_loss
        self.init_std = init_std
        self.init_xavier_std = init_xavier_std
        self.dice_weight = dice_weight
        self.cross_entropy_weight = cross_entropy_weight
        self.mask_weight = mask_weight
        self.output_auxiliary_logits = output_auxiliary_logits
        self.backbone = backbone
        self.use_pretrained_backbone = use_pretrained_backbone
        self.use_timm_backbone = use_timm_backbone
        self.backbone_kwargs = backbone_kwargs
        super().__init__(**kwargs)
