from .configuration_idefics2 import (Idefics2Config, Idefics2PerceiverConfig,
                                     Idefics2VisionConfig)
from .modeling_idefics2 import Idefics2ForConditionalGeneration, Idefics2Model
from .image_processing_idefics2 import Idefics2ImageProcessor
from .processing_idefics2 import Idefics2Processor
