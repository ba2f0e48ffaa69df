from .configuration_clip import CLIPConfig, CLIPTextConfig, CLIPVisionConfig
from .modeling_clip import (
    CLIPVisionModel,
    CLIPModel,
    CLIPOutput,
    CLIPPreTrainedModel,
    CLIPTextTransformer,
    CLIPVisionTransformer,
)
from .image_processing_clip import CLIPImageProcessor
from .processing_clip import CLIPProcessor
