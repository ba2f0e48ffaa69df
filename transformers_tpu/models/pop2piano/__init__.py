from .modeling_pop2piano import (
    Pop2PianoConfig,
    Pop2PianoForConditionalGeneration,
)
