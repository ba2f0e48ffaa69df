from .configuration_blip_2 import Blip2Config, Blip2QFormerConfig, Blip2VisionConfig
from .modeling_blip_2 import (
    Blip2ForConditionalGeneration,
    Blip2QFormerModel,
    Blip2VisionModel,
)
from .processing_blip_2 import Blip2Processor
