from .configuration_apertus import ApertusConfig
from .modeling_apertus import ApertusForCausalLM, ApertusModel, ApertusModelStandalone
