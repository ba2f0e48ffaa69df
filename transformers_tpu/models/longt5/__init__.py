from .configuration_longt5 import LongT5Config
from .modeling_longt5 import (
    LongT5EncoderModel,
    LongT5ForConditionalGeneration,
    LongT5Stack,
)
