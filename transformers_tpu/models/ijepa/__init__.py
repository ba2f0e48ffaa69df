from .modeling_ijepa import (IJepaConfig, IJepaForImageClassification,
                             IJepaModel, IJepaModelStandalone)
