from .modeling_unispeech_sat import (
    UniSpeechSatConfig,
    UniSpeechSatForCTC,
    UniSpeechSatForSequenceClassification,
    UniSpeechSatModelStandalone,
)
