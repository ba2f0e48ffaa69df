from .configuration_aimv2 import Aimv2Config, Aimv2TextConfig, Aimv2VisionConfig
from .modeling_aimv2 import Aimv2Model, Aimv2TextModel, Aimv2VisionModel
