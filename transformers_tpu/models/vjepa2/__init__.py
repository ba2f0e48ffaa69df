from .configuration_vjepa2 import VJEPA2Config
from .modeling_vjepa2 import (
    VJEPA2ForVideoClassification,
    VJEPA2Model,
)
from .video_processing_vjepa2 import VJEPA2VideoProcessor
