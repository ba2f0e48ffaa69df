from .modeling_minimax import (
    MiniMaxConfig,
    MiniMaxForCausalLM,
    MiniMaxModel,
    MiniMaxModelStandalone,
)
