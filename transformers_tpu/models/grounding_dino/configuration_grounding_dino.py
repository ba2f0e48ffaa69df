"""Grounding-DINO config (reference
models/grounding_dino/configuration_grounding_dino.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig
from ..auto.configuration_auto import get_config_class


class GroundingDinoConfig(PretrainedConfig):
    model_type = "grounding-dino"

    def __init__(self, backbone_config=None, text_config=None, num_queries=900,
                 encoder_layers=6, encoder_ffn_dim=2048, encoder_attention_heads=8,
                 decoder_layers=6, decoder_ffn_dim=2048, decoder_attention_heads=8,
                 is_encoder_decoder=True, activation_function="relu", d_model=256,
                 dropout=0.1, activation_dropout=0.0, attention_dropout=0.0,
                 auxiliary_loss=False, position_embedding_type="sine",
                 num_feature_levels=4, encoder_n_points=4, decoder_n_points=4,
                 two_stage=True, class_cost=1.0, bbox_cost=5.0, giou_cost=2.0,
                 bbox_loss_coefficient=5.0, giou_loss_coefficient=2.0,
                 focal_alpha=0.25, disable_custom_kernels=False,
                 max_text_len=256, text_enhancer_dropout=0.0,
                 fusion_droppath=0.1, fusion_dropout=0.0,
                 embedding_init_target=True, query_dim=4,
                 decoder_bbox_embed_share=True, two_stage_bbox_embed_share=False,
                 positional_embedding_temperature=20, init_std=0.02,
                 layer_norm_eps=1e-5, **kwargs):
        if isinstance(backbone_config, dict):
            backbone_config = get_config_class(
                backbone_config.get("model_type", "resnet"))(**backbone_config)
        elif backbone_config is None:
            backbone_config = get_config_class("swin")(
                out_features=["stage2", "stage3", "stage4"])
        if isinstance(text_config, dict):
            text_config = get_config_class(
                text_config.get("model_type", "bert"))(**text_config)
        elif text_config is None:
            text_config = get_config_class("bert")()
        self.backbone_config = backbone_config
        self.text_config = text_config
        self.num_queries = num_queries
        self.encoder_layers = encoder_layers
        self.encoder_ffn_dim = encoder_ffn_dim
        self.encoder_attention_heads = encoder_attention_heads
        self.decoder_layers = decoder_layers
        self.decoder_ffn_dim = decoder_ffn_dim
        self.decoder_attention_heads = decoder_attention_heads
        self.activation_function = activation_function
        self.d_model = d_model
        self.hidden_size = d_model  # MultiheadAttention reads hidden_size
        self.dropout = dropout
        self.activation_dropout = activation_dropout
        self.attention_dropout = attention_dropout
        self.auxiliary_loss = auxiliary_loss
        self.position_embedding_type = position_embedding_type
        self.num_feature_levels = num_feature_levels
        self.encoder_n_points = encoder_n_points
        self.decoder_n_points = decoder_n_points
        self.two_stage = two_stage
        self.class_cost = class_cost
        self.bbox_cost = bbox_cost
        self.giou_cost = giou_cost
        self.bbox_loss_coefficient = bbox_loss_coefficient
        self.giou_loss_coefficient = giou_loss_coefficient
        self.focal_alpha = focal_alpha
        self.disable_custom_kernels = disable_custom_kernels
        self.max_text_len = max_text_len
        self.text_enhancer_dropout = text_enhancer_dropout
        self.fusion_droppath = fusion_droppath
        self.fusion_dropout = fusion_dropout
        self.embedding_init_target = embedding_init_target
        self.query_dim = query_dim
        self.decoder_bbox_embed_share = decoder_bbox_embed_share
        self.two_stage_bbox_embed_share = two_stage_bbox_embed_share
        self.positional_embedding_temperature = positional_embedding_temperature
        self.init_std = init_std
        self.initializer_range = init_std
        self.layer_norm_eps = layer_norm_eps
        super().__init__(is_encoder_decoder=is_encoder_decoder, **kwargs)
