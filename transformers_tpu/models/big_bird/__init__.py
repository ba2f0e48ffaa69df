from .configuration_big_bird import BigBirdConfig
from .modeling_big_bird import BigBirdForMaskedLM, BigBirdModel, BigBirdModelStandalone
