from .configuration_fuyu import FuyuConfig
from .modeling_fuyu import FuyuForCausalLM
