"""X-CLIP configs (reference src/transformers/models/x_clip/configuration_x_clip.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class XCLIPTextConfig(PretrainedConfig):
    model_type = "xclip_text_model"

    def __init__(self, vocab_size=49408, hidden_size=512, intermediate_size=2048,
                 num_hidden_layers=12, num_attention_heads=8,
                 max_position_embeddings=77, hidden_act="quick_gelu",
                 layer_norm_eps=1e-5, attention_dropout=0.0,
                 initializer_range=0.02, initializer_factor=1.0,
                 pad_token_id=1, bos_token_id=0, eos_token_id=2, **kwargs):
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
        super().__init__(pad_token_id=pad_token_id, bos_token_id=bos_token_id,
                         eos_token_id=eos_token_id, **kwargs)


class XCLIPVisionConfig(PretrainedConfig):
    model_type = "xclip_vision_model"

    def __init__(self, hidden_size=768, intermediate_size=3072,
                 num_hidden_layers=12, num_attention_heads=12,
                 mit_hidden_size=512, mit_intermediate_size=2048,
                 mit_num_hidden_layers=1, mit_num_attention_heads=8,
                 num_channels=3, image_size=224, patch_size=32, num_frames=8,
                 hidden_act="quick_gelu", layer_norm_eps=1e-5,
                 attention_dropout=0.0, initializer_range=0.02,
                 initializer_factor=1.0, drop_path_rate=0.0, **kwargs):
        self.hidden_size = hidden_size
        self.intermediate_size = intermediate_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.mit_hidden_size = mit_hidden_size
        self.mit_intermediate_size = mit_intermediate_size
        self.mit_num_hidden_layers = mit_num_hidden_layers
        self.mit_num_attention_heads = mit_num_attention_heads
        self.num_channels = num_channels
        self.image_size = image_size
        self.patch_size = patch_size
        self.num_frames = num_frames
        self.hidden_act = hidden_act
        self.layer_norm_eps = layer_norm_eps
        self.attention_dropout = attention_dropout
        self.initializer_range = initializer_range
        self.initializer_factor = initializer_factor
        self.drop_path_rate = drop_path_rate
        super().__init__(**kwargs)


class XCLIPConfig(PretrainedConfig):
    model_type = "xclip"
    sub_configs = {"text_config": XCLIPTextConfig,
                   "vision_config": XCLIPVisionConfig}

    def __init__(self, text_config=None, vision_config=None, projection_dim=512,
                 prompt_layers=2, prompt_alpha=0.1,
                 prompt_hidden_act="quick_gelu", prompt_num_attention_heads=8,
                 prompt_attention_dropout=0.0, prompt_projection_dropout=0.0,
                 logit_scale_init_value=2.6592, **kwargs):
        if isinstance(text_config, dict) or text_config is None:
            text_config = XCLIPTextConfig(**(text_config or {}))
        if isinstance(vision_config, dict) or vision_config is None:
            vision_config = XCLIPVisionConfig(**(vision_config or {}))
        self.text_config = text_config
        self.vision_config = vision_config
        self.projection_dim = projection_dim
        self.prompt_layers = prompt_layers
        self.prompt_alpha = prompt_alpha
        self.prompt_hidden_act = prompt_hidden_act
        self.prompt_num_attention_heads = prompt_num_attention_heads
        self.prompt_attention_dropout = prompt_attention_dropout
        self.prompt_projection_dropout = prompt_projection_dropout
        self.logit_scale_init_value = logit_scale_init_value
        self.initializer_range = 0.02
        self.initializer_factor = 1.0
        super().__init__(**kwargs)
