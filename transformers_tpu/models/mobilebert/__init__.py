from .configuration_mobilebert import MobileBertConfig
from .modeling_mobilebert import (
    MobileBertForMaskedLM,
    MobileBertForQuestionAnswering,
    MobileBertForSequenceClassification,
    MobileBertModelStandalone,
)
