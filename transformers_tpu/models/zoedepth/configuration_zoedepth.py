"""ZoeDepth config (reference models/zoedepth/configuration_zoedepth.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig
from ..beit.configuration_beit import BeitConfig


class ZoeDepthConfig(PretrainedConfig):
    model_type = "zoedepth"
    sub_configs = {"backbone_config": BeitConfig}

    def __init__(self, backbone_config=None, backbone=None,
                 use_pretrained_backbone=False, backbone_kwargs=None,
                 hidden_act="gelu", initializer_range=0.02,
                 batch_norm_eps=1e-5, readout_type="project",
                 reassemble_factors=(4, 2, 1, 0.5),
                 neck_hidden_sizes=(96, 192, 384, 768), fusion_hidden_size=256,
                 head_in_index=-1, use_batch_norm_in_fusion_residual=False,
                 use_bias_in_fusion_residual=None, num_relative_features=32,
                 add_projection=False, bottleneck_features=256,
                 num_attractors=(16, 8, 4, 1), bin_embedding_dim=128,
                 attractor_alpha=1000, attractor_gamma=2, attractor_kind="mean",
                 min_temp=0.0212, max_temp=50.0, bin_centers_type="softplus",
                 bin_configurations=({"n_bins": 64, "min_depth": 0.001,
                                      "max_depth": 10.0},),
                 num_patch_transformer_layers=None,
                 patch_transformer_hidden_size=None,
                 patch_transformer_intermediate_size=None,
                 patch_transformer_num_attention_heads=None, **kwargs):
        kwargs.pop("backbone_hidden_size", None)
        if backbone_config is None:
            backbone_config = BeitConfig(
                image_size=384, num_hidden_layers=24, hidden_size=1024,
                intermediate_size=4096, num_attention_heads=16,
                use_relative_position_bias=True, reshape_hidden_states=False,
                out_features=["stage6", "stage12", "stage18", "stage24"])
        elif isinstance(backbone_config, dict):
            backbone_config = BeitConfig(**{
                k: v for k, v in backbone_config.items() if k != "model_type"})
        self.backbone_config = backbone_config
        self.backbone = backbone
        self.use_pretrained_backbone = use_pretrained_backbone
        self.backbone_kwargs = backbone_kwargs
        self.hidden_act = hidden_act
        self.initializer_range = initializer_range
        self.batch_norm_eps = batch_norm_eps
        self.readout_type = readout_type
        self.reassemble_factors = list(reassemble_factors)
        self.neck_hidden_sizes = list(neck_hidden_sizes)
        self.fusion_hidden_size = fusion_hidden_size
        self.head_in_index = head_in_index
        self.use_batch_norm_in_fusion_residual = use_batch_norm_in_fusion_residual
        self.use_bias_in_fusion_residual = use_bias_in_fusion_residual
        self.num_relative_features = num_relative_features
        self.add_projection = add_projection
        self.bottleneck_features = bottleneck_features
        self.num_attractors = list(num_attractors)
        self.bin_embedding_dim = bin_embedding_dim
        self.attractor_alpha = attractor_alpha
        self.attractor_gamma = attractor_gamma
        self.attractor_kind = attractor_kind
        self.min_temp = min_temp
        self.max_temp = max_temp
        self.bin_centers_type = bin_centers_type
        self.bin_configurations = [dict(c) for c in bin_configurations]
        self.num_patch_transformer_layers = num_patch_transformer_layers
        self.patch_transformer_hidden_size = patch_transformer_hidden_size
        self.patch_transformer_intermediate_size = patch_transformer_intermediate_size
        self.patch_transformer_num_attention_heads = patch_transformer_num_attention_heads
        super().__init__(**kwargs)
        # mirrored from the backbone so DPT-style neck modules can share code
        self.hidden_size = self.backbone_config.hidden_size
        self.backbone_hidden_size = self.backbone_config.hidden_size
