from .configuration_megatron_bert import MegatronBertConfig
from .modeling_megatron_bert import (
    MegatronBertForMaskedLM,
    MegatronBertModel,
    MegatronBertModelStandalone,
)
