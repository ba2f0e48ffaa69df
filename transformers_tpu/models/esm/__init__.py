from .configuration_esm import EsmConfig
from .modeling_esm import EsmForMaskedLM, EsmModel, EsmModelStandalone
