from .configuration_fnet import FNetConfig
from .modeling_fnet import FNetForMaskedLM, FNetModel, FNetModelStandalone
