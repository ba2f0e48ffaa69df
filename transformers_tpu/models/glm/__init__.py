from .configuration_glm import GlmConfig
from .modeling_glm import GlmForCausalLM, GlmModel, GlmModelStandalone
