from .configuration_bridgetower import (
    BridgeTowerConfig,
    BridgeTowerTextConfig,
    BridgeTowerVisionConfig,
)
from .modeling_bridgetower import (
    BridgeTowerForContrastiveLearning,
    BridgeTowerForImageAndTextRetrieval,
    BridgeTowerModel,
)
from .image_processing_bridgetower import BridgeTowerImageProcessor
from .processing_bridgetower import BridgeTowerProcessor
