from .configuration_emu3 import Emu3Config, Emu3TextConfig, Emu3VQVAEConfig
from .modeling_emu3 import (
    Emu3ForCausalLM,
    Emu3ForConditionalGeneration,
    Emu3Model,
    Emu3VQVAE,
)
