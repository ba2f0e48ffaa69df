from .configuration_align import AlignConfig, AlignTextConfig, AlignVisionConfig
from .modeling_align import AlignModel
