from .configuration_llava_next_video import LlavaNextVideoConfig
from .modeling_llava_next_video import (LlavaNextVideoForConditionalGeneration,
                                        LlavaNextVideoModel)
from .processing_llava_next_video import LlavaNextVideoProcessor
from .video_processing_llava_next_video import LlavaNextVideoVideoProcessor
