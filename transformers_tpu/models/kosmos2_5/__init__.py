from .configuration_kosmos2_5 import (
    Kosmos2_5Config,
    Kosmos2_5TextConfig,
    Kosmos2_5VisionConfig,
)
from .modeling_kosmos2_5 import (
    Kosmos2_5ForConditionalGeneration,
    Kosmos2_5VisionModel,
)
