from .configuration_granitemoehybrid import GraniteMoeHybridConfig
from .modeling_granitemoehybrid import (
    GraniteMoeHybridForCausalLM,
    GraniteMoeHybridModel,
    GraniteMoeHybridModelStandalone,
)
