from .configuration_cwm import CwmConfig
from .modeling_cwm import CwmForCausalLM, CwmModel, CwmModelStandalone
