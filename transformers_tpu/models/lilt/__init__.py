from .modeling_lilt import (
    LiltConfig,
    LiltForQuestionAnswering,
    LiltForSequenceClassification,
    LiltForTokenClassification,
    LiltModel,
    LiltModelStandalone,
)
