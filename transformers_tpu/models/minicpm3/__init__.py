from .configuration_minicpm3 import MiniCPM3Config
from .modeling_minicpm3 import (
    MiniCPM3ForCausalLM,
    MiniCPM3Model,
    MiniCPM3ModelStandalone,
)
