from .configuration_align import AlignConfig, AlignTextConfig, AlignVisionConfig
from .modeling_align import AlignModel
from .processing_align import AlignProcessor
