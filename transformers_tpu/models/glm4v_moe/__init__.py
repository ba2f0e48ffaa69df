from .configuration_glm4v_moe import (Glm4vMoeConfig, Glm4vMoeTextConfig,
                                      Glm4vMoeVisionConfig)
from .modeling_glm4v_moe import (Glm4vMoeForConditionalGeneration,
                                 Glm4vMoeModel, Glm4vMoeTextModel)
