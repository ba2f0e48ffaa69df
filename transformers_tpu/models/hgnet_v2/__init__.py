from .modeling_hgnet_v2 import (
    HGNetV2Backbone,
    HGNetV2Config,
    HGNetV2ForImageClassification,
)
