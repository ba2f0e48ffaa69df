from .configuration_squeezebert import SqueezeBertConfig
from .modeling_squeezebert import (
    SqueezeBertForMaskedLM,
    SqueezeBertForQuestionAnswering,
    SqueezeBertForSequenceClassification,
    SqueezeBertForTokenClassification,
    SqueezeBertModelStandalone,
)
