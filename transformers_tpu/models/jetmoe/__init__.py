from .configuration_jetmoe import JetMoeConfig
from .modeling_jetmoe import (JetMoeForCausalLM, JetMoeModel,
                              JetMoeModelStandalone)
