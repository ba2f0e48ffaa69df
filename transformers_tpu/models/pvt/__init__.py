from .configuration_pvt import PvtConfig
from .modeling_pvt import PvtForImageClassification, PvtModelStandalone
from .image_processing_pvt import PvtImageProcessor
