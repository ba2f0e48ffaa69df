from .configuration_idefics2 import (Idefics2Config, Idefics2PerceiverConfig,
                                     Idefics2VisionConfig)
from .modeling_idefics2 import Idefics2ForConditionalGeneration, Idefics2Model
