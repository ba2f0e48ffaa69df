from .configuration_nemotron_h import NemotronHConfig
from .modeling_nemotron_h import (
    NemotronHForCausalLM,
    NemotronHModel,
    NemotronHModelStandalone,
)
