from .configuration_dbrx import DbrxAttentionConfig, DbrxConfig, DbrxFFNConfig
from .modeling_dbrx import DbrxForCausalLM, DbrxModel, DbrxModelStandalone
