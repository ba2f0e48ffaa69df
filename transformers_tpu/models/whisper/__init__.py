from .configuration_whisper import WhisperConfig
from .feature_extraction_whisper import WhisperFeatureExtractor
from .modeling_whisper import (
    WhisperForConditionalGeneration,
    WhisperModel,
    WhisperModelStandalone,
    WhisperPreTrainedModel,
)
from .processing_whisper import WhisperProcessor
