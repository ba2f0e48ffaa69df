from .configuration_phi import PhiConfig
from .modeling_phi import PhiForCausalLM, PhiModel, PhiModelStandalone
