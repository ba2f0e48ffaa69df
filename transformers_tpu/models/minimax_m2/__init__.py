from .configuration_minimax_m2 import MiniMaxM2Config
from .modeling_minimax_m2 import (
    MiniMaxM2ForCausalLM,
    MiniMaxM2Model,
    MiniMaxM2ModelStandalone,
)
