from .configuration_poolformer import PoolFormerConfig
from .modeling_poolformer import (
    PoolFormerForImageClassification,
    PoolFormerModelStandalone,
)
