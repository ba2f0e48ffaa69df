from .configuration_instructblip import (
    InstructBlipConfig,
    InstructBlipQFormerConfig,
    InstructBlipVisionConfig,
)
from .modeling_instructblip import (
    InstructBlipForConditionalGeneration,
    InstructBlipQFormerModel,
)
from .processing_instructblip import InstructBlipProcessor
