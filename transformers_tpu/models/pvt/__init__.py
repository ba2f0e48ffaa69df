from .configuration_pvt import PvtConfig
from .modeling_pvt import PvtForImageClassification, PvtModelStandalone
