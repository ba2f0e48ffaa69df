from .configuration_sam import (
    SamConfig,
    SamMaskDecoderConfig,
    SamPromptEncoderConfig,
    SamVisionConfig,
)
from .modeling_sam import SamModel, SamVisionModel
from .image_processing_sam import SamImageProcessor
from .processing_sam import SamProcessor
