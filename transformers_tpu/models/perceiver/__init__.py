from .configuration_perceiver import PerceiverConfig
from .modeling_perceiver import (
    PerceiverForImageClassificationLearned,
    PerceiverForMaskedLM,
    PerceiverForSequenceClassification,
    PerceiverModel,
)
