from .configuration_musicgen_melody import (MusicgenMelodyConfig,
                                            MusicgenMelodyDecoderConfig)
from .modeling_musicgen_melody import (MusicgenMelodyForCausalLM,
                                       MusicgenMelodyForConditionalGeneration)
