from .configuration_musicgen_melody import (MusicgenMelodyConfig,
                                            MusicgenMelodyDecoderConfig)
from .modeling_musicgen_melody import (MusicgenMelodyForCausalLM,
                                       MusicgenMelodyForConditionalGeneration)
from .feature_extraction_musicgen_melody import MusicgenMelodyFeatureExtractor
from .processing_musicgen_melody import MusicgenMelodyProcessor
