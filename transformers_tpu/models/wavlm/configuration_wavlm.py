"""WavLM config (reference src/transformers/models/wavlm/configuration_wavlm.py)."""

from __future__ import annotations

from ..wav2vec2.configuration_wav2vec2 import Wav2Vec2Config


class WavLMConfig(Wav2Vec2Config):
    model_type = "wavlm"

    def __init__(self, num_buckets=320, max_bucket_distance=800, **kwargs):
        self.num_buckets = num_buckets
        self.max_bucket_distance = max_bucket_distance
        super().__init__(**kwargs)
