from .configuration_pix2struct import (
    Pix2StructConfig,
    Pix2StructTextConfig,
    Pix2StructVisionConfig,
)
from .modeling_pix2struct import Pix2StructForConditionalGeneration
from .image_processing_pix2struct import Pix2StructImageProcessor
from .processing_pix2struct import Pix2StructProcessor
