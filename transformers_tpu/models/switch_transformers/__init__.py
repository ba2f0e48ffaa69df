from .configuration_switch_transformers import SwitchTransformersConfig
from .modeling_switch_transformers import (
    SwitchTransformersEncoderModel,
    SwitchTransformersForConditionalGeneration,
    SwitchTransformersSparseMLP,
)
