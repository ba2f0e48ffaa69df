from .configuration_levit import LevitConfig
from .modeling_levit import (
    LevitForImageClassification,
    LevitForImageClassificationWithTeacher,
    LevitModelStandalone,
)
