from .configuration_layoutlm import LayoutLMConfig
from .modeling_layoutlm import (
    LayoutLMForQuestionAnswering,
    LayoutLMForSequenceClassification,
    LayoutLMForTokenClassification,
    LayoutLMModel,
    LayoutLMModelStandalone,
)
