from .configuration_deformable_detr import DeformableDetrConfig
from .modeling_deformable_detr import (
    DeformableDetrForObjectDetection,
    DeformableDetrModel,
    DeformableDetrModelStandalone,
    DeformableDetrPreTrainedModel,
)
