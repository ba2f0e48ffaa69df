from .configuration_lfm2_moe import Lfm2MoeConfig
from .modeling_lfm2_moe import (
    Lfm2MoeForCausalLM,
    Lfm2MoeModel,
    Lfm2MoeModelStandalone,
)
