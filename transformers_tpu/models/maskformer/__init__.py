from .configuration_maskformer import MaskFormerConfig
from .modeling_maskformer import (
    MaskFormerForInstanceSegmentation,
    MaskFormerModel,
)
