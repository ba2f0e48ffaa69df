from .configuration_mimi import MimiConfig
from .modeling_mimi import MimiModel
