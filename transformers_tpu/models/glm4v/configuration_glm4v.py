"""GLM-4V configs (reference
src/transformers/models/glm4v/configuration_glm4v.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class Glm4vVisionConfig(PretrainedConfig):
    model_type = "glm4v"
    base_config_key = "vision_config"

    def __init__(self, depth=24, hidden_size=1536, hidden_act="silu",
                 attention_bias=False, attention_dropout=0.0, num_heads=12,
                 in_channels=3, image_size=336, patch_size=14, rms_norm_eps=1e-5,
                 spatial_merge_size=2, temporal_patch_size=2, out_hidden_size=4096,
                 intermediate_size=13696, initializer_range=0.02, **kwargs):
        self.depth = depth
        self.hidden_size = hidden_size
        self.hidden_act = hidden_act
        self.attention_bias = attention_bias
        self.attention_dropout = attention_dropout
        self.num_heads = num_heads
        self.in_channels = in_channels
        self.image_size = image_size
        self.patch_size = patch_size
        self.rms_norm_eps = rms_norm_eps
        self.spatial_merge_size = spatial_merge_size
        self.temporal_patch_size = temporal_patch_size
        self.out_hidden_size = out_hidden_size
        self.intermediate_size = intermediate_size
        self.initializer_range = initializer_range
        super().__init__(**kwargs)


class Glm4vTextConfig(PretrainedConfig):
    model_type = "glm4v_text"

    def __init__(self, vocab_size=151552, hidden_size=4096, intermediate_size=13696,
                 num_hidden_layers=40, num_attention_heads=32, num_key_value_heads=2,
                 hidden_act="silu", max_position_embeddings=32768,
                 initializer_range=0.02, rms_norm_eps=1e-5, use_cache=True,
                 tie_word_embeddings=False, rope_theta=10000.0, rope_scaling=None,
                 attention_dropout=0.0, **kwargs):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.intermediate_size = intermediate_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.num_key_value_heads = num_key_value_heads
        self.hidden_act = hidden_act
        self.max_position_embeddings = max_position_embeddings
        self.initializer_range = initializer_range
        self.rms_norm_eps = rms_norm_eps
        self.use_cache = use_cache
        self.rope_theta = rope_theta
        if rope_scaling is None:
            rope_scaling = {"rope_type": "default", "mrope_section": [8, 12, 12]}
        self.rope_scaling = rope_scaling
        self.attention_dropout = attention_dropout
        self.head_dim = hidden_size // num_attention_heads
        self.attention_bias = True
        super().__init__(tie_word_embeddings=tie_word_embeddings, **kwargs)

    @property
    def mrope_section(self):
        return (self.rope_scaling or {}).get("mrope_section", [8, 12, 12])


class Glm4vConfig(PretrainedConfig):
    model_type = "glm4v"
    sub_configs = {"text_config": "auto", "vision_config": "auto"}

    def __init__(self, text_config=None, vision_config=None, image_token_id=151343,
                 video_token_id=151344, image_start_token_id=151339,
                 image_end_token_id=151340, video_start_token_id=151341,
                 video_end_token_id=151342, tie_word_embeddings=False, **kwargs):
        if isinstance(vision_config, dict):
            vision_config = Glm4vVisionConfig(
                **{k: v for k, v in vision_config.items() if k != "model_type"})
        elif vision_config is None:
            vision_config = Glm4vVisionConfig()
        if isinstance(text_config, dict):
            text_config = Glm4vTextConfig(
                **{k: v for k, v in text_config.items() if k != "model_type"})
        elif text_config is None:
            text_config = Glm4vTextConfig()
        self.vision_config = vision_config
        self.text_config = text_config
        self.image_token_id = image_token_id
        self.video_token_id = video_token_id
        self.image_start_token_id = image_start_token_id
        self.image_end_token_id = image_end_token_id
        self.video_start_token_id = video_start_token_id
        self.video_end_token_id = video_end_token_id
        super().__init__(tie_word_embeddings=tie_word_embeddings, **kwargs)
