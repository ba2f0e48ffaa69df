from .configuration_dab_detr import DabDetrConfig
from .modeling_dab_detr import (DabDetrForObjectDetection,
                                DabDetrModelStandalone)
