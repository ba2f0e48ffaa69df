from .configuration_gpt_neo import GPTNeoConfig
from .modeling_gpt_neo import GPTNeoForCausalLM, GPTNeoModel, GPTNeoModelStandalone
