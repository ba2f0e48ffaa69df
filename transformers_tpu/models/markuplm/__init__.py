from .modeling_markuplm import (
    MarkupLMConfig,
    MarkupLMForQuestionAnswering,
    MarkupLMForSequenceClassification,
    MarkupLMForTokenClassification,
    MarkupLMModel,
    MarkupLMModelStandalone,
)
