from .configuration_granitemoe_swa import GraniteMoeSWAConfig
from .modeling_granitemoe_swa import (
    GraniteMoeSWAForCausalLM,
    GraniteMoeSWAModelStandalone,
)
