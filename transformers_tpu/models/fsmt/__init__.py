from .modeling_fsmt import (
    FSMTConfig,
    FSMTForConditionalGeneration,
)
