from .configuration_jamba import JambaConfig
from .modeling_jamba import (
    JambaForCausalLM,
    JambaMambaMixer,
    JambaModel,
    JambaModelStandalone,
    JambaSparseMoeBlock,
)
