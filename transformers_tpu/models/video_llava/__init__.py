"""Video-LLaVA (reference models/video_llava/)."""
from .configuration_video_llava import VideoLlavaConfig
from .modeling_video_llava import VideoLlavaForConditionalGeneration
