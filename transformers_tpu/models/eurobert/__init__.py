from .configuration_eurobert import EuroBertConfig
from .modeling_eurobert import (
    EuroBertForMaskedLM,
    EuroBertForSequenceClassification,
    EuroBertModelStandalone,
)
