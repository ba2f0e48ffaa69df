from .configuration_hubert import HubertConfig
from .modeling_hubert import (
    HubertForCTC,
    HubertForSequenceClassification,
    HubertModel,
    HubertModelStandalone,
)
