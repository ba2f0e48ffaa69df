from .modeling_ibert import (
    IBertConfig,
    IBertForMaskedLM,
    IBertForQuestionAnswering,
    IBertForSequenceClassification,
    IBertModel,
    IBertModelStandalone,
)
