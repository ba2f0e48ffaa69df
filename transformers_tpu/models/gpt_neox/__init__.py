from .configuration_gpt_neox import GPTNeoXConfig
from .modeling_gpt_neox import (
    GPTNeoXAttention,
    GPTNeoXForCausalLM,
    GPTNeoXLayer,
    GPTNeoXMLP,
    GPTNeoXModel,
    GPTNeoXModelStandalone,
    GPTNeoXPreTrainedModel,
)
