"""Grounding-DINO (reference models/grounding_dino/)."""
from .configuration_grounding_dino import GroundingDinoConfig
from .modeling_grounding_dino import GroundingDinoForObjectDetection
