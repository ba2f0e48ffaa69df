from .configuration_bit import BitConfig
from .modeling_bit import BitForImageClassification, BitModelStandalone
from .image_processing_bit import BitImageProcessor
