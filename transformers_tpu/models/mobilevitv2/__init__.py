from .configuration_mobilevitv2 import MobileViTV2Config
from .modeling_mobilevitv2 import (MobileViTV2ForImageClassification,
                                   MobileViTV2Model, MobileViTV2ModelStandalone)
