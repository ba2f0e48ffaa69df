from .configuration_olmo import OlmoConfig
from .modeling_olmo import OlmoForCausalLM, OlmoModel, OlmoModelStandalone
