from .configuration_kyutai_speech_to_text import KyutaiSpeechToTextConfig
from .modeling_kyutai_speech_to_text import (
    KyutaiSpeechToTextForConditionalGeneration,
    KyutaiSpeechToTextModel,
)
