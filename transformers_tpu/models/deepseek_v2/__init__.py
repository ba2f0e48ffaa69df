from .configuration_deepseek_v2 import DeepseekV2Config
from .modeling_deepseek_v2 import (DeepseekV2ForCausalLM, DeepseekV2Model,
                                   DeepseekV2ModelStandalone)
