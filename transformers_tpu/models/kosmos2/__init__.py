from .configuration_kosmos2 import (
    Kosmos2Config,
    Kosmos2TextConfig,
    Kosmos2VisionConfig,
)
from .modeling_kosmos2 import Kosmos2ForConditionalGeneration
from .processing_kosmos2 import Kosmos2Processor
