from .configuration_opt import OPTConfig
from .modeling_opt import (
    OPTAttention,
    OPTDecoder,
    OPTDecoderLayer,
    OPTForCausalLM,
    OPTModel,
    OPTModelStandalone,
)
