from .configuration_longcat_flash import LongcatFlashConfig
from .modeling_longcat_flash import (
    LongcatFlashForCausalLM,
    LongcatFlashModelStandalone,
)
