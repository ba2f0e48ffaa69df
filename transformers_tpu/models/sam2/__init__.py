from .configuration_sam2 import (Sam2Config, Sam2HieraDetConfig,
                                 Sam2MaskDecoderConfig, Sam2PromptEncoderConfig,
                                 Sam2VisionConfig)
from .modeling_sam2 import Sam2Model, Sam2VisionModel
from .processing_sam2 import Sam2Processor
