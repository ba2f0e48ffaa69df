from .configuration_dia import DiaConfig, DiaDecoderConfig, DiaEncoderConfig
from .modeling_dia import DiaForConditionalGeneration, DiaModel
