from .configuration_youtu import YoutuConfig
from .modeling_youtu import YoutuForCausalLM, YoutuModel, YoutuModelStandalone
