"""YOLOS config (reference src/transformers/models/yolos/configuration_yolos.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class YolosConfig(PretrainedConfig):
    model_type = "yolos"

    def __init__(self, hidden_size=768, num_hidden_layers=12,
                 num_attention_heads=12, intermediate_size=3072,
                 hidden_act="gelu", hidden_dropout_prob=0.0,
                 attention_probs_dropout_prob=0.0, initializer_range=0.02,
                 layer_norm_eps=1e-12, image_size=(512, 864), patch_size=16,
                 num_channels=3, qkv_bias=True, num_detection_tokens=100,
                 use_mid_position_embeddings=True, auxiliary_loss=False,
                 class_cost=1, bbox_cost=5, giou_cost=2,
                 bbox_loss_coefficient=5, giou_loss_coefficient=2,
                 eos_coefficient=0.1, **kwargs):
        self.hidden_size = hidden_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.intermediate_size = intermediate_size
        self.hidden_act = hidden_act
        self.hidden_dropout_prob = hidden_dropout_prob
        self.attention_probs_dropout_prob = attention_probs_dropout_prob
        self.initializer_range = initializer_range
        self.layer_norm_eps = layer_norm_eps
        self.image_size = list(image_size)
        self.patch_size = patch_size
        self.num_channels = num_channels
        self.qkv_bias = qkv_bias
        self.num_detection_tokens = num_detection_tokens
        self.use_mid_position_embeddings = use_mid_position_embeddings
        self.auxiliary_loss = auxiliary_loss
        self.class_cost = class_cost
        self.bbox_cost = bbox_cost
        self.giou_cost = giou_cost
        self.bbox_loss_coefficient = bbox_loss_coefficient
        self.giou_loss_coefficient = giou_loss_coefficient
        self.eos_coefficient = eos_coefficient
        super().__init__(**kwargs)
