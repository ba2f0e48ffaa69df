"""MobileNetV2 config (reference src/transformers/models/mobilenet_v2/configuration_mobilenet_v2.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class MobileNetV2Config(PretrainedConfig):
    model_type = "mobilenet_v2"

    def __init__(self, num_channels=3, image_size=224, depth_multiplier=1.0,
                 depth_divisible_by=8, min_depth=8, expand_ratio=6.0,
                 output_stride=32, first_layer_is_expansion=True,
                 finegrained_output=True, hidden_act="relu6", tf_padding=True,
                 classifier_dropout_prob=0.8, initializer_range=0.02,
                 layer_norm_eps=0.001, semantic_loss_ignore_index=255, **kwargs):
        self.num_channels = num_channels
        self.image_size = image_size
        self.depth_multiplier = depth_multiplier
        self.depth_divisible_by = depth_divisible_by
        self.min_depth = min_depth
        self.expand_ratio = expand_ratio
        self.output_stride = output_stride
        self.first_layer_is_expansion = first_layer_is_expansion
        self.finegrained_output = finegrained_output
        self.hidden_act = hidden_act
        self.tf_padding = tf_padding
        self.classifier_dropout_prob = classifier_dropout_prob
        self.initializer_range = initializer_range
        self.layer_norm_eps = layer_norm_eps
        self.semantic_loss_ignore_index = semantic_loss_ignore_index
        super().__init__(**kwargs)
