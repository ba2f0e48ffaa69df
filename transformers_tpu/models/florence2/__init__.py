from .configuration_florence2 import Florence2Config, Florence2VisionConfig
from .modeling_florence2 import (
    Florence2ForConditionalGeneration,
    Florence2Model,
    Florence2VisionBackbone,
)
