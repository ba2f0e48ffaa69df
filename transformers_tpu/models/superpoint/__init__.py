from .configuration_superpoint import SuperPointConfig
from .modeling_superpoint import (
    SuperPointForKeypointDetection,
    SuperPointKeypointDescriptionOutput,
)
from .image_processing_superpoint import SuperPointImageProcessor
