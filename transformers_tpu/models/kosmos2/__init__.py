from .configuration_kosmos2 import (
    Kosmos2Config,
    Kosmos2TextConfig,
    Kosmos2VisionConfig,
)
from .modeling_kosmos2 import Kosmos2ForConditionalGeneration
