"""TimesFM config (reference models/timesfm/configuration_timesfm.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class TimesFmConfig(PretrainedConfig):
    model_type = "timesfm"

    def __init__(self, patch_length=32, context_length=512, horizon_length=128,
                 freq_size=3, num_hidden_layers=50, hidden_size=1280,
                 intermediate_size=1280, head_dim=80, num_attention_heads=16,
                 tolerance=1e-6, rms_norm_eps=1e-6,
                 quantiles=(0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9),
                 pad_val=1123581321.0, attention_dropout=0.0,
                 use_positional_embedding=False, initializer_range=0.02,
                 min_timescale=1, max_timescale=10_000, **kwargs):
        self.patch_length = patch_length
        self.context_length = context_length
        self.horizon_length = horizon_length
        self.quantiles = list(quantiles)
        self.pad_val = pad_val
        self.freq_size = freq_size
        self.hidden_size = hidden_size
        self.intermediate_size = intermediate_size
        self.head_dim = head_dim
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.tolerance = tolerance
        self.rms_norm_eps = rms_norm_eps
        self.attention_dropout = attention_dropout
        self.use_positional_embedding = use_positional_embedding
        self.initializer_range = initializer_range
        self.min_timescale = min_timescale
        self.max_timescale = max_timescale
        super().__init__(**kwargs)
