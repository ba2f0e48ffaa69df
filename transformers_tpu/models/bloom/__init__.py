from .configuration_bloom import BloomConfig
from .modeling_bloom import BloomForCausalLM, BloomModel, BloomModelStandalone
