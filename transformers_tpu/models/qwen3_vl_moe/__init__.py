from .configuration_qwen3_vl_moe import Qwen3VLMoeConfig, Qwen3VLMoeTextConfig
from .modeling_qwen3_vl_moe import (Qwen3VLMoeForConditionalGeneration,
                                    Qwen3VLMoeModel, Qwen3VLMoeTextModel)
