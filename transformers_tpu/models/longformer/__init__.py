from .configuration_longformer import LongformerConfig
from .modeling_longformer import (
    LongformerForMaskedLM,
    LongformerModel,
    LongformerModelStandalone,
)
