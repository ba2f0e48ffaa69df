from .configuration_owlvit import OwlViTConfig, OwlViTTextConfig, OwlViTVisionConfig
from .modeling_owlvit import (
    OwlViTForObjectDetection,
    OwlViTModel,
    OwlViTModelStandalone,
)
from .image_processing_owlvit import OwlViTImageProcessor
from .processing_owlvit import OwlViTProcessor
