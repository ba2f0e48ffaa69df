from .configuration_focalnet import FocalNetConfig
from .modeling_focalnet import (
    FocalNetForImageClassification,
    FocalNetModel,
)
