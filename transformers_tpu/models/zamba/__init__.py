from .configuration_zamba import ZambaConfig
from .modeling_zamba import (ZambaForCausalLM, ZambaModel,
                             ZambaModelStandalone)
