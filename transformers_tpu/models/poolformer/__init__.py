from .configuration_poolformer import PoolFormerConfig
from .modeling_poolformer import (
    PoolFormerForImageClassification,
    PoolFormerModelStandalone,
)
from .image_processing_poolformer import PoolFormerImageProcessor
