from .configuration_llava import LlavaConfig
from .modeling_llava import (
    LlavaForConditionalGeneration,
    LlavaModel,
    LlavaMultiModalProjector,
    LlavaPreTrainedModel,
)
from .processing_llava import LlavaProcessor
