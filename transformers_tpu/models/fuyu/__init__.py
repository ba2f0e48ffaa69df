from .configuration_fuyu import FuyuConfig
from .modeling_fuyu import FuyuForCausalLM
from .image_processing_fuyu import FuyuImageProcessor
from .processing_fuyu import FuyuProcessor
