from .configuration_xglm import XGLMConfig
from .modeling_xglm import XGLMForCausalLM, XGLMModel, XGLMModelStandalone
