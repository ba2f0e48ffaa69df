from .configuration_biogpt import BioGptConfig
from .modeling_biogpt import BioGptForCausalLM, BioGptModel, BioGptModelStandalone
