from .configuration_granite_swa import GraniteSWAConfig
from .modeling_granite_swa import (
    GraniteSWAForCausalLM,
    GraniteSWAModel,
    GraniteSWAModelStandalone,
)
