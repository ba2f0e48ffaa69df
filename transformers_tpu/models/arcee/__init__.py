from .configuration_arcee import ArceeConfig
from .modeling_arcee import ArceeForCausalLM, ArceeModel, ArceeModelStandalone
