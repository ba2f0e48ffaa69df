from .configuration_tapas import TapasConfig
from .modeling_tapas import (
    TapasForMaskedLM,
    TapasForQuestionAnswering,
    TapasForSequenceClassification,
    TapasModelStandalone,
)
