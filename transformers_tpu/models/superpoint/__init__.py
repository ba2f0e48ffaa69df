from .configuration_superpoint import SuperPointConfig
from .modeling_superpoint import (
    SuperPointForKeypointDetection,
    SuperPointKeypointDescriptionOutput,
)
