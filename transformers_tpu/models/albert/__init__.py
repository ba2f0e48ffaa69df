from .configuration_albert import AlbertConfig
from .modeling_albert import (
    AlbertForMaskedLM,
    AlbertForSequenceClassification,
    AlbertModel,
    AlbertModelStandalone,
)
