from .modeling_imagegpt import (
    ImageGPTConfig,
    ImageGPTForCausalImageModeling,
    ImageGPTForImageClassification,
    ImageGPTModel,
    ImageGPTModelStandalone,
)
from .image_processing_imagegpt import ImageGPTImageProcessor
