from .modeling_gpt_neox_japanese import (
    GPTNeoXJapaneseConfig,
    GPTNeoXJapaneseForCausalLM,
    GPTNeoXJapaneseModel,
    GPTNeoXJapaneseModelStandalone,
)
