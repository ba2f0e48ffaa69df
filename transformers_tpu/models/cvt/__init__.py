from .configuration_cvt import CvtConfig
from .modeling_cvt import CvtForImageClassification, CvtModelStandalone
