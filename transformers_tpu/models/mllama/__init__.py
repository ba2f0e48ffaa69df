from .configuration_mllama import (MllamaConfig, MllamaTextConfig,
                                   MllamaVisionConfig)
from .modeling_mllama import (MllamaForConditionalGeneration, MllamaModel,
                              MllamaTextModel, MllamaVisionModel)
