from .modeling_sew_d import (
    SEWDConfig,
    SEWDForCTC,
    SEWDForSequenceClassification,
    SEWDModel,
    SEWDModelStandalone,
)
