from .configuration_mpt import MptAttentionConfig, MptConfig
from .modeling_mpt import MptForCausalLM, MptModel, MptModelStandalone
