from .configuration_mllama import (MllamaConfig, MllamaTextConfig,
                                   MllamaVisionConfig)
from .modeling_mllama import (MllamaForConditionalGeneration, MllamaModel,
                              MllamaTextModel, MllamaVisionModel)
from .image_processing_mllama import MllamaImageProcessor
from .processing_mllama import MllamaProcessor
