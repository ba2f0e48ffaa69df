from .configuration_owlvit import OwlViTConfig, OwlViTTextConfig, OwlViTVisionConfig
from .modeling_owlvit import (
    OwlViTForObjectDetection,
    OwlViTModel,
    OwlViTModelStandalone,
)
