from .configuration_videomae import VideoMAEConfig
from .modeling_videomae import (
    VideoMAEForVideoClassification,
    VideoMAEModel,
    VideoMAEModelStandalone,
)
from .image_processing_videomae import VideoMAEImageProcessor, VivitImageProcessor
from .video_processing_videomae import TimesformerVideoProcessor, VideoMAEVideoProcessor, VivitVideoProcessor
