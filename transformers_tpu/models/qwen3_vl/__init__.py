from .configuration_qwen3_vl import (Qwen3VLConfig, Qwen3VLTextConfig,
                                     Qwen3VLVisionConfig)
from .modeling_qwen3_vl import (Qwen3VLForConditionalGeneration, Qwen3VLModel,
                                Qwen3VLTextModel, Qwen3VLVisionModel)
from .processing_qwen3_vl import Qwen3VLProcessor
