from .configuration_mm_grounding_dino import MMGroundingDinoConfig
from .modeling_mm_grounding_dino import (
    MMGroundingDinoForObjectDetection,
    MMGroundingDinoModel,
)
