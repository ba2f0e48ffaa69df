from .configuration_resnet import ResNetConfig
from .modeling_resnet import (
    BackboneOutput,
    ResNetBackbone,
    ResNetForImageClassification,
    ResNetModel,
    ResNetModelStandalone,
)
