"""SEW config (reference src/transformers/models/sew/configuration_sew.py)."""

from __future__ import annotations

from ..wav2vec2.configuration_wav2vec2 import Wav2Vec2Config


class SEWConfig(Wav2Vec2Config):
    model_type = "sew"

    def __init__(self, squeeze_factor=2,
                 conv_dim=(64, 128, 128, 128, 128, 256, 256, 256, 256, 512, 512, 512, 512),
                 conv_stride=(5, 2, 1, 2, 1, 2, 1, 2, 1, 2, 1, 2, 1),
                 conv_kernel=(10, 3, 1, 3, 1, 3, 1, 3, 1, 2, 1, 2, 1),
                 **kwargs):
        super().__init__(conv_dim=tuple(conv_dim), conv_stride=tuple(conv_stride),
                         conv_kernel=tuple(conv_kernel), **kwargs)
        self.squeeze_factor = squeeze_factor
