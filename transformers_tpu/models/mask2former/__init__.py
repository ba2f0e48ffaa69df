from .configuration_mask2former import Mask2FormerConfig
from .modeling_mask2former import (
    Mask2FormerForUniversalSegmentation,
    Mask2FormerModel,
)
