"""DepthAnything config (reference
src/transformers/models/depth_anything/configuration_depth_anything.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class DepthAnythingConfig(PretrainedConfig):
    model_type = "depth_anything"
    sub_configs = {"backbone_config": "auto"}

    def __init__(self, backbone_config=None, backbone=None,
                 use_pretrained_backbone=False, use_timm_backbone=False,
                 backbone_kwargs=None, patch_size=14, initializer_range=0.02,
                 reassemble_hidden_size=384, reassemble_factors=(4, 2, 1, 0.5),
                 neck_hidden_sizes=(48, 96, 192, 384), fusion_hidden_size=64,
                 head_in_index=-1, head_hidden_size=32,
                 depth_estimation_type="relative", max_depth=None, **kwargs):
        from ..auto.configuration_auto import AutoConfig

        if isinstance(backbone_config, dict):
            backbone_config = AutoConfig.for_model_type(
                backbone_config.get("model_type", "dinov2"),
                **{k: v for k, v in backbone_config.items() if k != "model_type"})
        self.backbone_config = backbone_config
        self.backbone = backbone
        self.use_pretrained_backbone = use_pretrained_backbone
        self.use_timm_backbone = use_timm_backbone
        self.backbone_kwargs = backbone_kwargs
        self.patch_size = patch_size
        self.initializer_range = initializer_range
        self.reassemble_hidden_size = reassemble_hidden_size
        self.reassemble_factors = list(reassemble_factors)
        self.neck_hidden_sizes = list(neck_hidden_sizes)
        self.fusion_hidden_size = fusion_hidden_size
        self.head_in_index = head_in_index
        self.head_hidden_size = head_hidden_size
        self.depth_estimation_type = depth_estimation_type
        self.max_depth = max_depth if max_depth is not None else 1
        super().__init__(**kwargs)
