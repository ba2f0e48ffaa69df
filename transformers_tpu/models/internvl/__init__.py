from .configuration_internvl import InternVLConfig, InternVLVisionConfig
from .modeling_internvl import (InternVLForConditionalGeneration, InternVLModel,
                                InternVLVisionModel)
from .processing_internvl import InternVLProcessor
from .video_processing_internvl import InternVLVideoProcessor
