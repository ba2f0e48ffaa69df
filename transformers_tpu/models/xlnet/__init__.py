from .configuration_xlnet import XLNetConfig
from .modeling_xlnet import (
    XLNetForQuestionAnsweringSimple,
    XLNetForSequenceClassification,
    XLNetForTokenClassification,
    XLNetLMHeadModel,
    XLNetModelStandalone,
)
