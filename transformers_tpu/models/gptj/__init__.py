from .configuration_gptj import GPTJConfig
from .modeling_gptj import (
    GPTJAttention,
    GPTJBlock,
    GPTJForCausalLM,
    GPTJMLP,
    GPTJModel,
    GPTJModelStandalone,
)
