"""SuperPoint config (reference src/transformers/models/superpoint/configuration_superpoint.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class SuperPointConfig(PretrainedConfig):
    model_type = "superpoint"

    def __init__(
        self,
        encoder_hidden_sizes=(64, 64, 128, 128),
        decoder_hidden_size=256,
        keypoint_decoder_dim=65,
        descriptor_decoder_dim=256,
        keypoint_threshold=0.005,
        max_keypoints=-1,
        nms_radius=4,
        border_removal_distance=4,
        initializer_range=0.02,
        **kwargs,
    ):
        self.encoder_hidden_sizes = list(encoder_hidden_sizes)
        self.decoder_hidden_size = decoder_hidden_size
        self.keypoint_decoder_dim = keypoint_decoder_dim
        self.descriptor_decoder_dim = descriptor_decoder_dim
        self.keypoint_threshold = keypoint_threshold
        self.max_keypoints = max_keypoints
        self.nms_radius = nms_radius
        self.border_removal_distance = border_removal_distance
        self.initializer_range = initializer_range
        super().__init__(**kwargs)
