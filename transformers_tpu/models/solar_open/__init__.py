from .configuration_solar_open import SolarOpenConfig
from .modeling_solar_open import (
    SolarOpenForCausalLM,
    SolarOpenModel,
    SolarOpenModelStandalone,
)
