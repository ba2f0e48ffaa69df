from .configuration_llama4 import (Llama4Config, Llama4TextConfig,
                                   Llama4VisionConfig)
from .modeling_llama4 import (Llama4ForCausalLM, Llama4TextModel,
                              Llama4TextModelStandalone)
