from .modeling_cpmant import (
    CpmAntConfig,
    CpmAntForCausalLM,
    CpmAntModel,
    CpmAntModelStandalone,
)
