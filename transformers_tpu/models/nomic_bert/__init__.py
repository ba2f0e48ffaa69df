from .configuration_nomic_bert import NomicBertConfig
from .modeling_nomic_bert import (
    NomicBertForMaskedLM,
    NomicBertModel,
    NomicBertModelStandalone,
)
