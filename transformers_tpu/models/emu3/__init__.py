from .configuration_emu3 import Emu3Config, Emu3TextConfig, Emu3VQVAEConfig
from .modeling_emu3 import (
    Emu3ForCausalLM,
    Emu3ForConditionalGeneration,
    Emu3Model,
    Emu3VQVAE,
)
from .image_processing_emu3 import Emu3ImageProcessor
from .processing_emu3 import Emu3Processor
