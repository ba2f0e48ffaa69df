from .configuration_llama4 import (Llama4Config, Llama4TextConfig,
                                   Llama4VisionConfig)
from .modeling_llama4 import (Llama4ForCausalLM,
                              Llama4ForConditionalGeneration,
                              Llama4TextModel, Llama4TextModelStandalone,
                              Llama4VisionModel)
from .processing_llama4 import Llama4Processor
