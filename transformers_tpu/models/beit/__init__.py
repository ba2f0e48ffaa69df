from .configuration_beit import BeitConfig
from .modeling_beit import BeitForImageClassification, BeitModel, BeitModelStandalone
