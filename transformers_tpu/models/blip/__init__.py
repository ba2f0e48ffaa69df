from .configuration_blip import BlipConfig, BlipTextConfig, BlipVisionConfig
from .image_processing_blip import BlipImageProcessor
from .modeling_blip import (
    BlipForConditionalGeneration,
    BlipForImageTextRetrieval,
    BlipForQuestionAnswering,
    BlipModel,
    BlipVisionModel,
    BlipVisionModelStandalone,
)
from .modeling_blip_text import BlipTextLMHeadModel, BlipTextModel
from .processing_blip import BlipProcessor

__all__ = [
    "BlipConfig",
    "BlipTextConfig",
    "BlipVisionConfig",
    "BlipImageProcessor",
    "BlipProcessor",
    "BlipModel",
    "BlipVisionModel",
    "BlipVisionModelStandalone",
    "BlipTextModel",
    "BlipTextLMHeadModel",
    "BlipForConditionalGeneration",
    "BlipForQuestionAnswering",
    "BlipForImageTextRetrieval",
]
