from .configuration_trocr import TrOCRConfig
from .modeling_trocr import TrOCRDecoder, TrOCRForCausalLM
from .processing_trocr import TrOCRProcessor
