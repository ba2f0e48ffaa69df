from .configuration_gpt_bigcode import GPTBigCodeConfig
from .modeling_gpt_bigcode import (
    GPTBigCodeForCausalLM,
    GPTBigCodeModel,
    GPTBigCodeModelStandalone,
)
