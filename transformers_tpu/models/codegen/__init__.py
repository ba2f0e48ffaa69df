from .configuration_codegen import CodeGenConfig
from .modeling_codegen import CodeGenForCausalLM, CodeGenModel, CodeGenModelStandalone
