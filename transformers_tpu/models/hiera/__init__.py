from .configuration_hiera import HieraConfig
from .modeling_hiera import HieraForImageClassification, HieraModel
