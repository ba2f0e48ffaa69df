from .configuration_exaone_moe import ExaoneMoeConfig
from .modeling_exaone_moe import (
    ExaoneMoeForCausalLM,
    ExaoneMoeModel,
    ExaoneMoeModelStandalone,
)
