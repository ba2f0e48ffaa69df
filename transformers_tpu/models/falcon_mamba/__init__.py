from .configuration_falcon_mamba import FalconMambaConfig
from .modeling_falcon_mamba import (
    FalconMambaForCausalLM,
    FalconMambaModel,
    FalconMambaModelStandalone,
)
