from .configuration_beit import BeitConfig
from .modeling_beit import BeitForImageClassification, BeitModel, BeitModelStandalone
from .image_processing_beit import BeitImageProcessor
