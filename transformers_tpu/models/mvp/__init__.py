from .configuration_mvp import MvpConfig
from .modeling_mvp import (
    MvpForConditionalGeneration,
    MvpForQuestionAnswering,
    MvpForSequenceClassification,
)
