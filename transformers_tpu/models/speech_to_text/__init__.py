from .configuration_speech_to_text import Speech2TextConfig
from .modeling_speech_to_text import (
    Speech2TextForConditionalGeneration,
    Speech2TextModel,
)
from .feature_extraction_speech_to_text import Speech2TextFeatureExtractor
from .processing_speech_to_text import Speech2TextProcessor
