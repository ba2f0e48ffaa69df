from .configuration_mellum import MellumConfig
from .modeling_mellum import MellumForCausalLM, MellumModelStandalone
