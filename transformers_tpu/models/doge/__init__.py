from .modeling_doge import (
    DogeConfig,
    DogeForCausalLM,
    DogeModel,
    DogeModelStandalone,
)
