"""HuBERT config (reference src/transformers/models/hubert/configuration_hubert.py)."""

from __future__ import annotations

from ..wav2vec2.configuration_wav2vec2 import Wav2Vec2Config


class HubertConfig(Wav2Vec2Config):
    model_type = "hubert"

    def __init__(self, feat_proj_layer_norm=True, conv_pos_batch_norm=False, **kwargs):
        self.feat_proj_layer_norm = feat_proj_layer_norm
        self.conv_pos_batch_norm = conv_pos_batch_norm
        super().__init__(**kwargs)
