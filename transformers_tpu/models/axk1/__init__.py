from .configuration_axk1 import AXK1Config
from .modeling_axk1 import AXK1ForCausalLM, AXK1ModelStandalone
