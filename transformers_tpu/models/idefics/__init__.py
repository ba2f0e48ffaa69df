from .configuration_idefics import (
    IdeficsConfig,
    IdeficsPerceiverConfig,
    IdeficsVisionConfig,
)
from .modeling_idefics import IdeficsForVisionText2Text, IdeficsModel
