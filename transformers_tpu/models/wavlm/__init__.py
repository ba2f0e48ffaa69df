from .configuration_wavlm import WavLMConfig
from .modeling_wavlm import (
    WavLMForCTC,
    WavLMForSequenceClassification,
    WavLMModel,
    WavLMModelStandalone,
)
