from .configuration_hy_v3 import HYV3Config
from .modeling_hy_v3 import HYV3ForCausalLM, HYV3ModelStandalone
