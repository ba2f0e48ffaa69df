from .configuration_qwen2_vl import Qwen2VLConfig, Qwen2VLTextConfig, Qwen2VLVisionConfig
from .modeling_qwen2_vl import (
    Qwen2VLForConditionalGeneration,
    Qwen2VLModel,
    Qwen2VLTextModel,
    Qwen2VLVisionTransformer,
    get_rope_index,
)
from .image_processing_qwen2_vl import Qwen2VLImageProcessor, smart_resize
from .processing_qwen2_vl import Qwen2VLProcessor
from .video_processing_qwen2_vl import Qwen2VLVideoProcessor
