from .configuration_videomae import VideoMAEConfig
from .modeling_videomae import (
    VideoMAEForVideoClassification,
    VideoMAEModel,
    VideoMAEModelStandalone,
)
