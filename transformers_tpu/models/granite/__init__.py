from .configuration_granite import GraniteConfig
from .modeling_granite import (
    GraniteAttention,
    GraniteDecoderLayer,
    GraniteForCausalLM,
    GraniteModel,
    GraniteModelStandalone,
)
