from .configuration_qwen2_audio import Qwen2AudioConfig, Qwen2AudioEncoderConfig
from .modeling_qwen2_audio import (
    Qwen2AudioEncoder,
    Qwen2AudioForConditionalGeneration,
)
from .processing_qwen2_audio import Qwen2AudioProcessor
