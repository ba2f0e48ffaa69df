from .configuration_ministral import MinistralConfig
from .modeling_ministral import (MinistralForCausalLM, MinistralModel,
                                 MinistralModelStandalone)
