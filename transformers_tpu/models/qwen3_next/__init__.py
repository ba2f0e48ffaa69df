from .configuration_qwen3_next import Qwen3NextConfig
from .modeling_qwen3_next import (Qwen3NextForCausalLM, Qwen3NextModel,
                                  Qwen3NextModelStandalone)
