from .configuration_glm4v import (Glm4vConfig, Glm4vTextConfig,
                                  Glm4vVisionConfig)
from .modeling_glm4v import (Glm4vForConditionalGeneration, Glm4vModel,
                             Glm4vTextModel, Glm4vVisionModel)
from .processing_glm4v import Glm4vProcessor
from .video_processing_glm4v import Glm4vVideoProcessor
