from .configuration_groupvit import (GroupViTConfig, GroupViTTextConfig,
                                     GroupViTVisionConfig)
from .modeling_groupvit import GroupViTModel
