"""InstructBLIP-Video (reference models/instructblipvideo/)."""
from .configuration_instructblipvideo import InstructBlipVideoConfig
from .modeling_instructblipvideo import InstructBlipVideoForConditionalGeneration
