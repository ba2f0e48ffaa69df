"""DeepSeek-V3.2 (reference models/deepseek_v32/): MLA + DSA sparse attention."""
from .configuration_deepseek_v32 import DeepseekV32Config
from .modeling_deepseek_v32 import DeepseekV32ForCausalLM, DeepseekV32ModelStandalone
