"""T5Gemma (reference models/t5gemma/)."""
from .configuration_t5gemma import T5GemmaConfig, T5GemmaModuleConfig
from .modeling_t5gemma import T5GemmaEncoderModel, T5GemmaForConditionalGeneration
