from .modeling_umt5 import (
    UMT5Config,
    UMT5EncoderModel,
    UMT5ForConditionalGeneration,
    UMT5Stack,
)
