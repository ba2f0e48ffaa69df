"""AIMv2 configs (reference models/aimv2/configuration_aimv2.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class Aimv2VisionConfig(PretrainedConfig):
    model_type = "aimv2_vision_model"
    base_config_key = "vision_config"

    def __init__(self, hidden_size=1024, intermediate_size=2816,
                 num_hidden_layers=24, num_attention_heads=8, num_channels=3,
                 image_size=224, patch_size=14, rms_norm_eps=1e-5,
                 attention_dropout=0.0, qkv_bias=False, mlp_bias=False,
                 hidden_act="silu", initializer_range=0.02, use_head=True,
                 is_native=False, **kwargs):
        super().__init__(**kwargs)
        self.hidden_size = hidden_size
        self.intermediate_size = intermediate_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.num_channels = num_channels
        self.image_size = image_size
        self.patch_size = patch_size
        self.rms_norm_eps = rms_norm_eps
        self.attention_dropout = attention_dropout
        self.qkv_bias = qkv_bias
        self.mlp_bias = mlp_bias
        self.hidden_act = hidden_act
        self.initializer_range = initializer_range
        self.use_head = use_head
        self.is_native = is_native


class Aimv2TextConfig(PretrainedConfig):
    model_type = "aimv2_text_model"
    base_config_key = "text_config"

    def __init__(self, vocab_size=49408, hidden_size=768,
                 intermediate_size=2048, num_hidden_layers=12,
                 num_attention_heads=6, rms_norm_eps=1e-5,
                 attention_dropout=0.0, qkv_bias=False, mlp_bias=False,
                 hidden_act="silu", pad_token_id=None, bos_token_id=None,
                 eos_token_id=49407, max_position_embeddings=77,
                 initializer_range=0.02, **kwargs):
        super().__init__(pad_token_id=pad_token_id, bos_token_id=bos_token_id,
                         eos_token_id=eos_token_id, **kwargs)
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.intermediate_size = intermediate_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.rms_norm_eps = rms_norm_eps
        self.attention_dropout = attention_dropout
        self.qkv_bias = qkv_bias
        self.mlp_bias = mlp_bias
        self.hidden_act = hidden_act
        self.max_position_embeddings = max_position_embeddings
        self.initializer_range = initializer_range


class Aimv2Config(PretrainedConfig):
    model_type = "aimv2"
    sub_configs = {"text_config": Aimv2TextConfig,
                   "vision_config": Aimv2VisionConfig}

    def __init__(self, text_config=None, vision_config=None,
                 projection_dim=512, logit_scale_init_value=2.6592, **kwargs):
        def _sub(cls, value):
            if isinstance(value, cls):
                return value
            value = {k: v for k, v in (value or {}).items() if k != "model_type"}
            return cls(**value)

        self.text_config = _sub(Aimv2TextConfig, text_config)
        self.vision_config = _sub(Aimv2VisionConfig, vision_config)
        self.projection_dim = projection_dim
        self.logit_scale_init_value = logit_scale_init_value
        self.max_logit_scale = 100.0
        super().__init__(**kwargs)
