from .configuration_falcon_h1 import FalconH1Config
from .modeling_falcon_h1 import (
    FalconH1ForCausalLM,
    FalconH1Mixer,
    FalconH1Model,
    FalconH1ModelStandalone,
)
