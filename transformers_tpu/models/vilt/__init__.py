from .modeling_vilt import (
    ViltConfig,
    ViltForMaskedLM,
    ViltForQuestionAnswering,
    ViltModel,
    ViltModelStandalone,
)
from .image_processing_vilt import ViltImageProcessor
from .processing_vilt import ViltProcessor
