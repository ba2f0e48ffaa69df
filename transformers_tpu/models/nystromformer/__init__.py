from .modeling_nystromformer import (
    NystromformerConfig,
    NystromformerForMaskedLM,
    NystromformerForSequenceClassification,
    NystromformerModel,
    NystromformerModelStandalone,
)
