from .configuration_olmo3 import Olmo3Config
from .modeling_olmo3 import Olmo3ForCausalLM, Olmo3Model, Olmo3ModelStandalone
