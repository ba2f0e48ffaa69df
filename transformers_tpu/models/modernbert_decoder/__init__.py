from .modeling_modernbert_decoder import (
    ModernBertDecoderConfig,
    ModernBertDecoderForCausalLM,
    ModernBertDecoderModel,
    ModernBertDecoderModelStandalone,
)
