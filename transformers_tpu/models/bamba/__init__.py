from .configuration_bamba import BambaConfig
from .modeling_bamba import (
    BambaDecoderLayer,
    BambaForCausalLM,
    BambaModel,
    BambaModelStandalone,
    mamba2_hybrid_cache,
)
