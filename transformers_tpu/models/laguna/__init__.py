"""Laguna (reference models/laguna/)."""
from .configuration_laguna import LagunaConfig
from .modeling_laguna import LagunaForCausalLM, LagunaModelStandalone
