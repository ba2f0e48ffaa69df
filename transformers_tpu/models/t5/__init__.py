from .configuration_t5 import T5Config
from .modeling_t5 import (
    T5EncoderModel,
    T5ForConditionalGeneration,
    T5PreTrainedModel,
    T5Stack,
)
