from .configuration_levit import LevitConfig
from .modeling_levit import (
    LevitForImageClassification,
    LevitForImageClassificationWithTeacher,
    LevitModelStandalone,
)
from .image_processing_levit import LevitImageProcessor
