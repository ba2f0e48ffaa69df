from .configuration_detr import DetrConfig
from .modeling_detr import (
    DetrForObjectDetection,
    DetrModel,
    DetrModelStandalone,
)
from .image_processing_detr import DetrImageProcessor
