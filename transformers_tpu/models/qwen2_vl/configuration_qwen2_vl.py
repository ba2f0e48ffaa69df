"""Qwen2-VL configs (reference models/qwen2_vl/configuration_qwen2_vl.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class Qwen2VLVisionConfig(PretrainedConfig):
    model_type = "qwen2_vl"

    def __init__(
        self,
        depth=32,
        embed_dim=1280,
        hidden_size=3584,
        hidden_act="quick_gelu",
        mlp_ratio=4,
        num_heads=16,
        in_channels=3,
        patch_size=14,
        spatial_merge_size=2,
        temporal_patch_size=2,
        initializer_range=0.02,
        **kwargs,
    ):
        self.depth = depth
        self.embed_dim = embed_dim
        self.hidden_size = hidden_size
        self.hidden_act = hidden_act
        self.mlp_ratio = mlp_ratio
        self.num_heads = num_heads
        self.in_channels = in_channels
        self.patch_size = patch_size
        self.spatial_merge_size = spatial_merge_size
        self.temporal_patch_size = temporal_patch_size
        self.initializer_range = initializer_range
        super().__init__(**kwargs)


class Qwen2VLTextConfig(PretrainedConfig):
    model_type = "qwen2_vl_text"

    def __init__(
        self,
        vocab_size=152064,
        hidden_size=8192,
        intermediate_size=29568,
        num_hidden_layers=80,
        num_attention_heads=64,
        num_key_value_heads=8,
        hidden_act="silu",
        max_position_embeddings=32768,
        initializer_range=0.02,
        rms_norm_eps=1e-5,
        use_cache=True,
        tie_word_embeddings=False,
        rope_theta=1000000.0,
        use_sliding_window=False,
        sliding_window=4096,
        max_window_layers=80,
        attention_dropout=0.0,
        rope_scaling=None,
        **kwargs,
    ):
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
        self.use_sliding_window = use_sliding_window
        self.sliding_window = sliding_window if use_sliding_window else None
        self.max_window_layers = max_window_layers
        self.attention_dropout = attention_dropout
        self.rope_scaling = rope_scaling or {"type": "mrope", "mrope_section": [16, 24, 24]}
        # normalize like the reference (mrope keeps default frequencies)
        if self.rope_scaling.get("type") == "mrope":
            self.rope_scaling["rope_type"] = "default"
            self.rope_scaling["type"] = "default"
        self.attention_qkv_bias = True
        self.attention_o_bias = False
        super().__init__(tie_word_embeddings=tie_word_embeddings, **kwargs)

    @property
    def mrope_section(self):
        return self.rope_scaling.get("mrope_section")


class Qwen2VLConfig(PretrainedConfig):
    model_type = "qwen2_vl"
    sub_configs = {"vision_config": Qwen2VLVisionConfig, "text_config": Qwen2VLTextConfig}

    def __init__(self, text_config=None, vision_config=None, image_token_id=151655,
                 video_token_id=151656, vision_start_token_id=151652,
                 vision_end_token_id=151653, **kwargs):
        if isinstance(vision_config, dict) or vision_config is None:
            vision_config = Qwen2VLVisionConfig(**(vision_config or {}))
        if isinstance(text_config, dict) or text_config is None:
            # old single-level configs put text fields at the top level
            text_fields = dict(text_config or {})
            for k in list(kwargs):
                if k in ("vocab_size", "hidden_size", "intermediate_size", "num_hidden_layers",
                         "num_attention_heads", "num_key_value_heads", "rope_theta",
                         "rms_norm_eps", "rope_scaling", "max_position_embeddings"):
                    text_fields.setdefault(k, kwargs.pop(k))
            text_config = Qwen2VLTextConfig(**text_fields)
        self.vision_config = vision_config
        self.text_config = text_config
        self.image_token_id = image_token_id
        self.video_token_id = video_token_id
        self.vision_start_token_id = vision_start_token_id
        self.vision_end_token_id = vision_end_token_id
        super().__init__(**kwargs)
