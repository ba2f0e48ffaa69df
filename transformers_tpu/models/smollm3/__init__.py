from .configuration_smollm3 import SmolLM3Config
from .modeling_smollm3 import SmolLM3ForCausalLM, SmolLM3Model, SmolLM3ModelStandalone
