"""Autoformer config (reference src/transformers/models/autoformer/configuration_autoformer.py)."""

from __future__ import annotations

from ..time_series_transformer.configuration_time_series_transformer import \
    TimeSeriesTransformerConfig


class AutoformerConfig(TimeSeriesTransformerConfig):
    model_type = "autoformer"

    def __init__(self, label_length=10, moving_average=25,
                 autocorrelation_factor=3, **kwargs):
        self.label_length = label_length
        self.moving_average = moving_average
        self.autocorrelation_factor = autocorrelation_factor
        super().__init__(**kwargs)
