from .configuration_ernie import ErnieConfig
from .modeling_ernie import ErnieForMaskedLM, ErnieModel, ErnieModelStandalone
