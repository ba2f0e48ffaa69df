from .configuration_vitdet import VitDetConfig
from .modeling_vitdet import VitDetBackbone, VitDetModel
