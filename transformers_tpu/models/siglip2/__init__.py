from .configuration_siglip2 import (Siglip2Config, Siglip2TextConfig,
                                    Siglip2VisionConfig)
from .modeling_siglip2 import (Siglip2Model, Siglip2TextModel,
                               Siglip2VisionModel)
