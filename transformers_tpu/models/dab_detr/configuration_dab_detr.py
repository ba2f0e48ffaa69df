"""DAB-DETR config (reference models/dab_detr/configuration_dab_detr.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig
from ..resnet.configuration_resnet import ResNetConfig


class DabDetrConfig(PretrainedConfig):
    model_type = "dab-detr"
    sub_configs = {"backbone_config": ResNetConfig}

    def __init__(self, use_timm_backbone=False, backbone_config=None,
                 backbone=None, use_pretrained_backbone=False, num_queries=300,
                 encoder_layers=6, encoder_ffn_dim=2048, encoder_attention_heads=8,
                 decoder_layers=6, decoder_ffn_dim=2048, decoder_attention_heads=8,
                 is_encoder_decoder=True, activation_function="prelu",
                 hidden_size=256, dropout=0.1, attention_dropout=0.0,
                 activation_dropout=0.0, init_std=0.02, init_xavier_std=1.0,
                 auxiliary_loss=False, dilation=False, class_cost=2, bbox_cost=5,
                 giou_cost=2, cls_loss_coefficient=2, bbox_loss_coefficient=5,
                 giou_loss_coefficient=2, focal_alpha=0.25,
                 temperature_height=20, temperature_width=20, query_dim=4,
                 random_refpoints_xy=False, keep_query_pos=False,
                 num_patterns=0, normalize_before=False,
                 sine_position_embedding_scale=None,
                 initializer_bias_prior_prob=None, **kwargs):
        if backbone_config is None:
            backbone_config = ResNetConfig(out_features=["stage4"])
        elif isinstance(backbone_config, dict):
            backbone_config = ResNetConfig(**{k: v for k, v in backbone_config.items()
                                              if k != "model_type"})
        self.backbone_config = backbone_config
        self.use_timm_backbone = use_timm_backbone
        self.backbone = backbone
        self.use_pretrained_backbone = use_pretrained_backbone
        self.num_queries = num_queries
        self.encoder_layers = encoder_layers
        self.encoder_ffn_dim = encoder_ffn_dim
        self.encoder_attention_heads = encoder_attention_heads
        self.decoder_layers = decoder_layers
        self.decoder_ffn_dim = decoder_ffn_dim
        self.decoder_attention_heads = decoder_attention_heads
        self.activation_function = activation_function
        self.hidden_size = hidden_size
        self.d_model = hidden_size
        self.dropout = dropout
        self.attention_dropout = attention_dropout
        self.activation_dropout = activation_dropout
        self.init_std = init_std
        self.init_xavier_std = init_xavier_std
        self.auxiliary_loss = auxiliary_loss
        self.dilation = dilation
        self.class_cost = class_cost
        self.bbox_cost = bbox_cost
        self.giou_cost = giou_cost
        self.cls_loss_coefficient = cls_loss_coefficient
        self.bbox_loss_coefficient = bbox_loss_coefficient
        self.giou_loss_coefficient = giou_loss_coefficient
        self.focal_alpha = focal_alpha
        self.temperature_height = temperature_height
        self.temperature_width = temperature_width
        self.query_dim = query_dim
        self.random_refpoints_xy = random_refpoints_xy
        self.keep_query_pos = keep_query_pos
        self.num_patterns = num_patterns
        self.normalize_before = normalize_before
        self.sine_position_embedding_scale = sine_position_embedding_scale
        self.initializer_bias_prior_prob = initializer_bias_prior_prob
        super().__init__(is_encoder_decoder=is_encoder_decoder, **kwargs)
