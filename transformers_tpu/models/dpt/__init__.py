from .configuration_dpt import DPTConfig
from .modeling_dpt import DPTForDepthEstimation
