from .configuration_diffllama import DiffLlamaConfig
from .modeling_diffllama import (DiffLlamaForCausalLM, DiffLlamaModel,
                                 DiffLlamaModelStandalone)
