from .modeling_roc_bert import (
    RoCBertConfig,
    RoCBertForMaskedLM,
    RoCBertForSequenceClassification,
    RoCBertModel,
    RoCBertModelStandalone,
)
