"""UperNet config (reference models/upernet/configuration_upernet.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig
from ..convnext.configuration_convnext import ConvNextConfig


class UperNetConfig(PretrainedConfig):
    model_type = "upernet"
    sub_configs = {"backbone_config": ConvNextConfig}

    def __init__(self, backbone_config=None, backbone=None,
                 use_pretrained_backbone=False, use_timm_backbone=False,
                 backbone_kwargs=None, hidden_size=512,
                 initializer_range=0.02, pool_scales=(1, 2, 3, 6),
                 use_auxiliary_head=True, auxiliary_loss_weight=0.4,
                 auxiliary_in_channels=None, auxiliary_channels=256,
                 auxiliary_num_convs=1, auxiliary_concat_input=False,
                 loss_ignore_index=255, **kwargs):
        if backbone_config is None:
            backbone_config = ConvNextConfig(
                out_features=["stage1", "stage2", "stage3", "stage4"])
        elif isinstance(backbone_config, dict):
            backbone_config = ConvNextConfig(**{
                k: v for k, v in backbone_config.items() if k != "model_type"})
        self.backbone_config = backbone_config
        self.backbone = backbone
        self.use_pretrained_backbone = use_pretrained_backbone
        self.use_timm_backbone = use_timm_backbone
        self.backbone_kwargs = backbone_kwargs
        self.hidden_size = hidden_size
        self.initializer_range = initializer_range
        self.pool_scales = list(pool_scales)
        self.use_auxiliary_head = use_auxiliary_head
        self.auxiliary_loss_weight = auxiliary_loss_weight
        self.auxiliary_in_channels = auxiliary_in_channels
        self.auxiliary_channels = auxiliary_channels
        self.auxiliary_num_convs = auxiliary_num_convs
        self.auxiliary_concat_input = auxiliary_concat_input
        self.loss_ignore_index = loss_ignore_index
        super().__init__(**kwargs)
