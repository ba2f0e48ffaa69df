from .configuration_bitnet import BitNetConfig
from .modeling_bitnet import BitNetForCausalLM, BitNetModel, BitNetModelStandalone
