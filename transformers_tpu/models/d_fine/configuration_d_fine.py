"""D-FINE config (reference models/d_fine/configuration_d_fine.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig
from ..hgnet_v2.modeling_hgnet_v2 import HGNetV2Config
from ..rt_detr.configuration_rt_detr import RTDetrConfig


class DFineConfig(RTDetrConfig):
    model_type = "d_fine"
    sub_configs = {"backbone_config": HGNetV2Config}

    def __init__(self, backbone_config=None, eval_idx=-1, layer_scale=1,
                 max_num_bins=32, reg_scale=4.0, depth_mult=1.0,
                 top_prob_values=4, lqe_hidden_dim=64, lqe_layers=2,
                 decoder_offset_scale=0.5, decoder_method="default", up=0.5,
                 weight_loss_fgl=0.15, weight_loss_ddf=1.5, **kwargs):
        if backbone_config is None:
            # reference configuration_d_fine.py:222 defaults the HGNet backbone
            # to out_indices=[2, 3, 4] so the three encoder_in_channels stages
            # (512/1024/2048) are what the backbone actually emits
            backbone_config = HGNetV2Config(out_indices=[2, 3, 4])
        elif isinstance(backbone_config, dict):
            backbone_config = HGNetV2Config(**{
                k: v for k, v in backbone_config.items() if k != "model_type"})
        self.eval_idx = eval_idx
        self.layer_scale = layer_scale
        self.max_num_bins = max_num_bins
        self.reg_scale = reg_scale
        self.depth_mult = depth_mult
        self.top_prob_values = top_prob_values
        self.lqe_hidden_dim = lqe_hidden_dim
        self.lqe_layers = lqe_layers
        self.decoder_offset_scale = decoder_offset_scale
        self.decoder_method = decoder_method
        self.up = up
        self.weight_loss_fgl = weight_loss_fgl
        self.weight_loss_ddf = weight_loss_ddf
        super().__init__(**kwargs)
        # RTDetrConfig default-creates a ResNet backbone config; override
        self.backbone_config = backbone_config
