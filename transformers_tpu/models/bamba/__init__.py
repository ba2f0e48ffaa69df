from .configuration_bamba import BambaConfig
from .modeling_bamba import (
    BambaDecoderLayer,
    BambaForCausalLM,
    BambaModel,
    BambaModelStandalone,
    init_hybrid_cache,
)
