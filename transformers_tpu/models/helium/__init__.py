from .configuration_helium import HeliumConfig
from .modeling_helium import HeliumForCausalLM, HeliumModel, HeliumModelStandalone
