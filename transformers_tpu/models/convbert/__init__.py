from .configuration_convbert import ConvBertConfig
from .modeling_convbert import (
    ConvBertForMaskedLM,
    ConvBertForSequenceClassification,
    ConvBertModelStandalone,
)
