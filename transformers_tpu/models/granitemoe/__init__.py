from .configuration_granitemoe import GraniteMoeConfig
from .modeling_granitemoe import (
    GraniteMoeForCausalLM,
    GraniteMoeModel,
    GraniteMoeModelStandalone,
)
