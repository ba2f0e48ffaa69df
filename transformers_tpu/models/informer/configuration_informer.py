"""Informer config (reference src/transformers/models/informer/configuration_informer.py)."""

from __future__ import annotations

from ..time_series_transformer.configuration_time_series_transformer import \
    TimeSeriesTransformerConfig


class InformerConfig(TimeSeriesTransformerConfig):
    model_type = "informer"

    def __init__(self, attention_type="prob", sampling_factor=5, distil=True,
                 **kwargs):
        self.attention_type = attention_type
        self.sampling_factor = sampling_factor
        self.distil = distil
        super().__init__(**kwargs)
