from .configuration_flava import (
    FlavaConfig,
    FlavaImageCodebookConfig,
    FlavaImageConfig,
    FlavaMultimodalConfig,
    FlavaTextConfig,
)
from .modeling_flava import (
    FlavaForPreTraining,
    FlavaImageCodebook,
    FlavaModel,
)
from .processing_flava import FlavaProcessor
