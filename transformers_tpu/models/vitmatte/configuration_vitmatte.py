"""ViTMatte config (reference models/vitmatte/configuration_vitmatte.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig
from ..vitdet.configuration_vitdet import VitDetConfig


class VitMatteConfig(PretrainedConfig):
    model_type = "vitmatte"
    sub_configs = {"backbone_config": VitDetConfig}

    def __init__(self, backbone_config=None, backbone=None,
                 use_pretrained_backbone=False, use_timm_backbone=False,
                 backbone_kwargs=None, hidden_size=384, batch_norm_eps=1e-5,
                 initializer_range=0.02, convstream_hidden_sizes=(48, 96, 192),
                 fusion_hidden_sizes=(256, 128, 64, 32), **kwargs):
        if backbone_config is None:
            backbone_config = VitDetConfig(num_channels=4)
        elif isinstance(backbone_config, dict):
            backbone_config = VitDetConfig(**{k: v for k, v in backbone_config.items()
                                              if k != "model_type"})
        self.backbone_config = backbone_config
        self.backbone = backbone
        self.use_pretrained_backbone = use_pretrained_backbone
        self.use_timm_backbone = use_timm_backbone
        self.backbone_kwargs = backbone_kwargs
        self.hidden_size = hidden_size
        self.batch_norm_eps = batch_norm_eps
        self.initializer_range = initializer_range
        self.convstream_hidden_sizes = list(convstream_hidden_sizes)
        self.fusion_hidden_sizes = list(fusion_hidden_sizes)
        super().__init__(**kwargs)
