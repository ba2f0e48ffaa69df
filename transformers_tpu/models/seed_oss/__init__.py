from .configuration_seed_oss import SeedOssConfig
from .modeling_seed_oss import (
    SeedOssForCausalLM,
    SeedOssModel,
    SeedOssModelStandalone,
)
