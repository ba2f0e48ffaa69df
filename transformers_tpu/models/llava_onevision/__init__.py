from .configuration_llava_onevision import LlavaOnevisionConfig
from .modeling_llava_onevision import (LlavaOnevisionForConditionalGeneration,
                                       LlavaOnevisionModel)
