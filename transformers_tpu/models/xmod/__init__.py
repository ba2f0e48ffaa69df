from .modeling_xmod import (
    XmodConfig,
    XmodForMaskedLM,
    XmodForSequenceClassification,
    XmodModel,
    XmodModelStandalone,
)
