from .configuration_mixtral import MixtralConfig
from .modeling_mixtral import (
    MixtralDecoderLayer,
    MixtralExpertMLP,
    MixtralForCausalLM,
    MixtralModel,
    MixtralModelStandalone,
    MixtralSparseMoeBlock,
)
