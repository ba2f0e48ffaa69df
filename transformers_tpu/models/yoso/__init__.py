from .modeling_yoso import (
    YosoConfig,
    YosoForMaskedLM,
    YosoForSequenceClassification,
    YosoModel,
    YosoModelStandalone,
)
