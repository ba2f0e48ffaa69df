from .configuration_conditional_detr import ConditionalDetrConfig
from .modeling_conditional_detr import (ConditionalDetrForObjectDetection,
                                        ConditionalDetrModelStandalone)
