from .configuration_patchtsmixer import PatchTSMixerConfig
from .modeling_patchtsmixer import (PatchTSMixerForPrediction,
                                    PatchTSMixerModel)
