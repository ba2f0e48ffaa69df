from .configuration_glm_moe_dsa import GlmMoeDsaConfig
from .modeling_glm_moe_dsa import (
    GlmMoeDsaForCausalLM,
    GlmMoeDsaModelStandalone,
)
