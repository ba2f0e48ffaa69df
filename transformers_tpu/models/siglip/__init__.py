from .configuration_siglip import SiglipConfig, SiglipTextConfig, SiglipVisionConfig
from .image_processing_siglip import SiglipImageProcessor
from .modeling_siglip import (
    SiglipModel,
    SiglipOutput,
    SiglipPreTrainedModel,
    SiglipTextTransformer,
    SiglipVisionModel,
    SiglipVisionTransformer,
)
from .processing_siglip import SiglipProcessor
