from .configuration_dpt import DPTConfig
from .modeling_dpt import DPTForDepthEstimation
from .image_processing_dpt import DPTImageProcessor
