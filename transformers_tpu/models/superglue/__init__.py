from .configuration_superglue import SuperGlueConfig
from .modeling_superglue import (
    SuperGlueForKeypointMatching,
    SuperGlueKeypointMatchingOutput,
)
from .image_processing_superglue import SuperGlueImageProcessor
