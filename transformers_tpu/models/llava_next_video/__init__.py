from .configuration_llava_next_video import LlavaNextVideoConfig
from .modeling_llava_next_video import (LlavaNextVideoForConditionalGeneration,
                                        LlavaNextVideoModel)
