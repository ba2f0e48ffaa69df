from .configuration_glm4 import Glm4Config
from .modeling_glm4 import Glm4ForCausalLM, Glm4Model, Glm4ModelStandalone
