from .configuration_mamba import MambaConfig
from .modeling_mamba import (
    MambaCache,
    MambaForCausalLM,
    MambaMixer,
    MambaModel,
    MambaModelStandalone,
    selective_scan,
)
