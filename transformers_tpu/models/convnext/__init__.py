from .configuration_convnext import ConvNextConfig
from .modeling_convnext import (
    ConvNextForImageClassification,
    ConvNextModel,
    ConvNextModelStandalone,
)
from .image_processing_convnext import ConvNextImageProcessor, ConvNextV2ImageProcessor
