from .configuration_sew import SEWConfig
from .modeling_sew import (
    SEWForCTC,
    SEWForSequenceClassification,
    SEWModelStandalone,
)
