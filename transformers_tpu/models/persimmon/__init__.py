from .configuration_persimmon import PersimmonConfig
from .modeling_persimmon import (
    PersimmonForCausalLM,
    PersimmonModel,
    PersimmonModelStandalone,
)
