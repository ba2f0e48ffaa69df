from .modeling_textnet import (
    TextNetConfig,
    TextNetForImageClassification,
    TextNetModel,
    TextNetModelStandalone,
)
from .image_processing_textnet import TextNetImageProcessor
