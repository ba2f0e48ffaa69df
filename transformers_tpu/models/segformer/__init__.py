from .configuration_segformer import SegformerConfig
from .modeling_segformer import (
    SegformerForImageClassification,
    SegformerForSemanticSegmentation,
    SegformerModel,
    SegformerModelStandalone,
)
from .image_processing_segformer import SegformerImageProcessor
