from .configuration_olmoe import OlmoeConfig
from .modeling_olmoe import OlmoeForCausalLM, OlmoeModel, OlmoeModelStandalone
