from .configuration_exaone4 import Exaone4Config
from .modeling_exaone4 import (
    Exaone4ForCausalLM,
    Exaone4Model,
    Exaone4ModelStandalone,
)
