from .configuration_mamba2 import Mamba2Config
from .modeling_mamba2 import (
    Mamba2ForCausalLM,
    Mamba2Mixer,
    Mamba2Model,
    Mamba2ModelStandalone,
    ssd_chunk_scan,
)
