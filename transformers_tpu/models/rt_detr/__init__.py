from .configuration_rt_detr import RTDetrConfig, RTDetrResNetConfig
from .modeling_rt_detr import RTDetrForObjectDetection, RTDetrModel
