from .configuration_rwkv import RwkvConfig
from .modeling_rwkv import RwkvForCausalLM, RwkvModelStandalone
