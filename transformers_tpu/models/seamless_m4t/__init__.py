from .modeling_seamless_m4t import (
    SeamlessM4TCodeHifiGan,
    SeamlessM4TConfig,
    SeamlessM4TForSpeechToText,
    SeamlessM4TForTextToText,
    SeamlessM4TModel,
    SeamlessM4TTextToUnitForConditionalGeneration,
)
from .feature_extraction_seamless_m4t import SeamlessM4TFeatureExtractor
from .processing_seamless_m4t import SeamlessM4TProcessor
