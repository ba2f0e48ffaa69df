"""SuperGlue config (reference src/transformers/models/superglue/configuration_superglue.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig
from ..superpoint.configuration_superpoint import SuperPointConfig


class SuperGlueConfig(PretrainedConfig):
    model_type = "superglue"
    sub_configs = {"keypoint_detector_config": SuperPointConfig}

    def __init__(
        self,
        keypoint_detector_config=None,
        hidden_size=256,
        keypoint_encoder_sizes=None,
        gnn_layers_types=None,
        num_attention_heads=4,
        sinkhorn_iterations=100,
        matching_threshold=0.0,
        initializer_range=0.02,
        attention_probs_dropout_prob=0.0,
        **kwargs,
    ):
        if isinstance(keypoint_detector_config, dict):
            keypoint_detector_config = SuperPointConfig(
                **{k: v for k, v in keypoint_detector_config.items() if k != "model_type"})
        self.keypoint_detector_config = keypoint_detector_config or SuperPointConfig()
        self.hidden_size = hidden_size
        self.keypoint_encoder_sizes = list(keypoint_encoder_sizes or [32, 64, 128, 256])
        self.gnn_layers_types = list(gnn_layers_types or ["self", "cross"] * 9)
        self.num_attention_heads = num_attention_heads
        self.sinkhorn_iterations = sinkhorn_iterations
        self.matching_threshold = matching_threshold
        self.initializer_range = initializer_range
        self.attention_probs_dropout_prob = attention_probs_dropout_prob
        super().__init__(**kwargs)
