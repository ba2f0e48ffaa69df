from .configuration_gemma3 import Gemma3Config, Gemma3TextConfig
from .modeling_gemma3 import (Gemma3ForCausalLM, Gemma3ForConditionalGeneration,
                              Gemma3Model, Gemma3TextModel, Gemma3TextModelStandalone)
from .image_processing_gemma3 import Gemma3ImageProcessor
from .processing_gemma3 import Gemma3Processor
