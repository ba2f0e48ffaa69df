from .configuration_metaclip_2 import (MetaClip2Config, MetaClip2TextConfig,
                                       MetaClip2VisionConfig)
from .modeling_metaclip_2 import (MetaClip2Model, MetaClip2TextModel,
                                  MetaClip2VisionModel)
