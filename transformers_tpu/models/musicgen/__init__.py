from .configuration_musicgen import MusicgenConfig, MusicgenDecoderConfig
from .modeling_musicgen import (
    MusicgenForCausalLM,
    MusicgenForConditionalGeneration,
)
from .processing_musicgen import MusicgenProcessor
