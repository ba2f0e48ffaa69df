from .configuration_bart import BartConfig
from .modeling_bart import (
    BartForConditionalGeneration,
    BartModel,
    BartPreTrainedModel,
)
