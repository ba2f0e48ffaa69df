from .configuration_zamba2 import Zamba2Config
from .modeling_zamba2 import (
    Zamba2ForCausalLM,
    Zamba2Model,
    Zamba2ModelStandalone,
)
