from .configuration_idefics3 import Idefics3Config, Idefics3VisionConfig
from .modeling_idefics3 import (Idefics3ForConditionalGeneration, Idefics3Model,
                                Idefics3VisionTransformer)
from .image_processing_idefics3 import Idefics3ImageProcessor
from .processing_idefics3 import Idefics3Processor
