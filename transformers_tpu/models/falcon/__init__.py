from .configuration_falcon import FalconConfig
from .modeling_falcon import (
    FalconAttention,
    FalconDecoderLayer,
    FalconForCausalLM,
    FalconMLP,
    FalconModel,
    FalconModelStandalone,
)
