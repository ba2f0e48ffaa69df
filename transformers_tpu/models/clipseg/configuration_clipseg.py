"""CLIPSeg configs (reference models/clipseg/configuration_clipseg.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class CLIPSegTextConfig(PretrainedConfig):
    model_type = "clipseg_text_model"
    base_config_key = "text_config"

    def __init__(self, vocab_size=49408, hidden_size=512,
                 intermediate_size=2048, num_hidden_layers=12,
                 num_attention_heads=8, max_position_embeddings=77,
                 hidden_act="quick_gelu", layer_norm_eps=1e-5,
                 attention_dropout=0.0, initializer_range=0.02,
                 initializer_factor=1.0, pad_token_id=1, bos_token_id=49406,
                 eos_token_id=49407, **kwargs):
        super().__init__(pad_token_id=pad_token_id, bos_token_id=bos_token_id,
                         eos_token_id=eos_token_id, **kwargs)
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.intermediate_size = intermediate_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.max_position_embeddings = max_position_embeddings
        self.hidden_act = hidden_act
        self.layer_norm_eps = layer_norm_eps
        self.attention_dropout = attention_dropout
        self.initializer_range = initializer_range
        self.initializer_factor = initializer_factor


class CLIPSegVisionConfig(PretrainedConfig):
    model_type = "clipseg_vision_model"
    base_config_key = "vision_config"

    def __init__(self, hidden_size=768, intermediate_size=3072,
                 num_hidden_layers=12, num_attention_heads=12, num_channels=3,
                 image_size=224, patch_size=32, hidden_act="quick_gelu",
                 layer_norm_eps=1e-5, attention_dropout=0.0,
                 initializer_range=0.02, initializer_factor=1.0, **kwargs):
        super().__init__(**kwargs)
        self.hidden_size = hidden_size
        self.intermediate_size = intermediate_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.num_channels = num_channels
        self.image_size = image_size
        self.patch_size = patch_size
        self.hidden_act = hidden_act
        self.layer_norm_eps = layer_norm_eps
        self.attention_dropout = attention_dropout
        self.initializer_range = initializer_range
        self.initializer_factor = initializer_factor


class CLIPSegConfig(PretrainedConfig):
    model_type = "clipseg"
    sub_configs = {"text_config": CLIPSegTextConfig,
                   "vision_config": CLIPSegVisionConfig}

    def __init__(self, text_config=None, vision_config=None,
                 projection_dim=512, logit_scale_init_value=2.6592,
                 extract_layers=(3, 6, 9), reduce_dim=64,
                 decoder_num_attention_heads=4, decoder_attention_dropout=0.0,
                 decoder_hidden_act="quick_gelu",
                 decoder_intermediate_size=2048, conditional_layer=0,
                 use_complex_transposed_convolution=False, **kwargs):
        def _sub(cls, value):
            if isinstance(value, cls):
                return value
            value = {k: v for k, v in (value or {}).items() if k != "model_type"}
            return cls(**value)

        self.text_config = _sub(CLIPSegTextConfig, text_config)
        self.vision_config = _sub(CLIPSegVisionConfig, vision_config)
        self.projection_dim = projection_dim
        self.logit_scale_init_value = logit_scale_init_value
        self.extract_layers = list(extract_layers)
        self.reduce_dim = reduce_dim
        self.decoder_num_attention_heads = decoder_num_attention_heads
        self.decoder_attention_dropout = decoder_attention_dropout
        self.decoder_hidden_act = decoder_hidden_act
        self.decoder_intermediate_size = decoder_intermediate_size
        self.conditional_layer = conditional_layer
        self.use_complex_transposed_convolution = use_complex_transposed_convolution
        super().__init__(**kwargs)
