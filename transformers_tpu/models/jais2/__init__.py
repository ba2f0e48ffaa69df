from .configuration_jais2 import Jais2Config
from .modeling_jais2 import Jais2ForCausalLM, Jais2Model, Jais2ModelStandalone
