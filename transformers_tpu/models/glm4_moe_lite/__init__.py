from .configuration_glm4_moe_lite import Glm4MoeLiteConfig
from .modeling_glm4_moe_lite import (
    Glm4MoeLiteForCausalLM,
    Glm4MoeLiteModel,
    Glm4MoeLiteModelStandalone,
)
