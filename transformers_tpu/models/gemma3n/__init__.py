from .configuration_gemma3n import Gemma3nTextConfig
from .modeling_gemma3n import (Gemma3nForCausalLM, Gemma3nTextModel)
from .processing_gemma3n import Gemma3nProcessor
