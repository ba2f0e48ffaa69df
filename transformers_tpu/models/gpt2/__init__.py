from .configuration_gpt2 import GPT2Config
from .modeling_gpt2 import (
    GPT2Attention,
    GPT2Block,
    GPT2LMHeadModel,
    GPT2MLP,
    GPT2Model,
    GPT2ModelStandalone,
    GPT2PreTrainedModel,
)
