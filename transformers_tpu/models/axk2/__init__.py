from .configuration_axk2 import AXK2Config
from .modeling_axk2 import AXK2ForCausalLM, AXK2ModelStandalone
