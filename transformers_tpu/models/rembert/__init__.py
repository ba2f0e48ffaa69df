from .configuration_rembert import RemBertConfig
from .modeling_rembert import RemBertForMaskedLM, RemBertModel, RemBertModelStandalone
