from .configuration_prophetnet import ProphetNetConfig
from .modeling_prophetnet import (
    ProphetNetForConditionalGeneration,
    ProphetNetModel,
)
