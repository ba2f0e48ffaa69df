from .configuration_llava_onevision import LlavaOnevisionConfig
from .modeling_llava_onevision import (LlavaOnevisionForConditionalGeneration,
                                       LlavaOnevisionModel)
from .processing_llava_onevision import LlavaOnevisionProcessor
from .video_processing_llava_onevision import LlavaOnevisionVideoProcessor
