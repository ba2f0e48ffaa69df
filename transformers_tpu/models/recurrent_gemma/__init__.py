from .configuration_recurrent_gemma import RecurrentGemmaConfig
from .modeling_recurrent_gemma import (
    RecurrentGemmaForCausalLM,
    RecurrentGemmaModelStandalone,
)
