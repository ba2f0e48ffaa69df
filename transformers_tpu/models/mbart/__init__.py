from .configuration_mbart import MBartConfig
from .modeling_mbart import (MBartForCausalLM, MBartForConditionalGeneration,
                             MBartModel)
