from .configuration_afmoe import AfmoeConfig
from .modeling_afmoe import AfmoeForCausalLM, AfmoeModelStandalone
