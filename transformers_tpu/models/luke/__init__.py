from .configuration_luke import LukeConfig
from .modeling_luke import LukeModel, LukeModelStandalone
