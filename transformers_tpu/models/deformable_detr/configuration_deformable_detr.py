"""Deformable DETR config (reference
src/transformers/models/deformable_detr/configuration_deformable_detr.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig
from ..resnet.configuration_resnet import ResNetConfig


class DeformableDetrConfig(PretrainedConfig):
    model_type = "deformable_detr"
    sub_configs = {"backbone_config": ResNetConfig}

    def __init__(self, backbone_config=None, num_queries=300,
                 encoder_layers=6, encoder_ffn_dim=1024, encoder_attention_heads=8,
                 decoder_layers=6, decoder_ffn_dim=1024, decoder_attention_heads=8,
                 is_encoder_decoder=True, activation_function="relu", d_model=256,
                 dropout=0.1, attention_dropout=0.0, activation_dropout=0.0,
                 init_std=0.02, init_xavier_std=1.0, auxiliary_loss=False,
                 position_embedding_type="sine", num_feature_levels=4,
                 encoder_n_points=4, decoder_n_points=4, two_stage=False,
                 two_stage_num_proposals=300, with_box_refine=False,
                 class_cost=1.0, bbox_cost=5.0, giou_cost=2.0,
                 mask_loss_coefficient=1.0, dice_loss_coefficient=1.0,
                 bbox_loss_coefficient=5.0, giou_loss_coefficient=2.0,
                 eos_coefficient=0.1, focal_alpha=0.25,
                 disable_custom_kernels=False, **kwargs):
        if backbone_config is None:
            backbone_config = ResNetConfig(out_features=["stage2", "stage3", "stage4"])
        elif isinstance(backbone_config, dict):
            backbone_config = ResNetConfig(
                **{k: v for k, v in backbone_config.items() if k != "model_type"})
        self.backbone_config = backbone_config
        self.num_queries = num_queries
        self.d_model = d_model
        self.encoder_layers = encoder_layers
        self.encoder_ffn_dim = encoder_ffn_dim
        self.encoder_attention_heads = encoder_attention_heads
        self.decoder_layers = decoder_layers
        self.decoder_ffn_dim = decoder_ffn_dim
        self.decoder_attention_heads = decoder_attention_heads
        self.is_encoder_decoder = is_encoder_decoder
        self.activation_function = activation_function
        self.dropout = dropout
        self.attention_dropout = attention_dropout
        self.activation_dropout = activation_dropout
        self.init_std = init_std
        self.init_xavier_std = init_xavier_std
        self.auxiliary_loss = auxiliary_loss
        self.position_embedding_type = position_embedding_type
        self.num_feature_levels = num_feature_levels
        self.encoder_n_points = encoder_n_points
        self.decoder_n_points = decoder_n_points
        self.two_stage = two_stage
        self.two_stage_num_proposals = two_stage_num_proposals
        self.with_box_refine = with_box_refine
        self.class_cost = class_cost
        self.bbox_cost = bbox_cost
        self.giou_cost = giou_cost
        self.mask_loss_coefficient = mask_loss_coefficient
        self.dice_loss_coefficient = dice_loss_coefficient
        self.bbox_loss_coefficient = bbox_loss_coefficient
        self.giou_loss_coefficient = giou_loss_coefficient
        self.eos_coefficient = eos_coefficient
        self.focal_alpha = focal_alpha
        self.disable_custom_kernels = disable_custom_kernels
        super().__init__(**kwargs)

    @property
    def num_attention_heads(self) -> int:
        return self.encoder_attention_heads

    @property
    def hidden_size(self) -> int:
        return self.d_model
