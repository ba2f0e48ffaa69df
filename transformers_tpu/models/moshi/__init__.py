from .configuration_moshi import MoshiConfig, MoshiDepthConfig
from .modeling_moshi import (MoshiDepthDecoder, MoshiForCausalLM,
                             MoshiForConditionalGeneration, MoshiModel,
                             MoshiModelStandalone)
