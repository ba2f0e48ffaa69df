from .configuration_dac import DacConfig
from .modeling_dac import DacModel
