from .modeling_unispeech import (
    UniSpeechConfig,
    UniSpeechForCTC,
    UniSpeechForSequenceClassification,
    UniSpeechModelStandalone,
)
