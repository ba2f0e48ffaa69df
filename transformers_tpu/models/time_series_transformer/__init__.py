from .configuration_time_series_transformer import TimeSeriesTransformerConfig
from .modeling_time_series_transformer import (
    TimeSeriesTransformerForPrediction,
    TimeSeriesTransformerModelStandalone,
)
