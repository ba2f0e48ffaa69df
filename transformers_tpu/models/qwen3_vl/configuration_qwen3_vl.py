"""Qwen3-VL configs (reference
src/transformers/models/qwen3_vl/configuration_qwen3_vl.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class Qwen3VLVisionConfig(PretrainedConfig):
    model_type = "qwen3_vl"
    base_config_key = "vision_config"

    def __init__(self, depth=27, hidden_size=1152, hidden_act="gelu_pytorch_tanh",
                 intermediate_size=4304, num_heads=16, in_channels=3, patch_size=16,
                 spatial_merge_size=2, temporal_patch_size=2, out_hidden_size=3584,
                 num_position_embeddings=2304, deepstack_visual_indexes=None,
                 initializer_range=0.02, **kwargs):
        self.depth = depth
        self.hidden_size = hidden_size
        self.hidden_act = hidden_act
        self.intermediate_size = intermediate_size
        self.num_heads = num_heads
        self.in_channels = in_channels
        self.patch_size = patch_size
        self.spatial_merge_size = spatial_merge_size
        self.temporal_patch_size = temporal_patch_size
        self.out_hidden_size = out_hidden_size
        self.num_position_embeddings = num_position_embeddings
        self.deepstack_visual_indexes = (deepstack_visual_indexes
                                         if deepstack_visual_indexes is not None
                                         else [8, 16, 24])
        self.initializer_range = initializer_range
        super().__init__(**kwargs)


class Qwen3VLTextConfig(PretrainedConfig):
    model_type = "qwen3_vl_text"

    def __init__(self, vocab_size=151936, hidden_size=4096, intermediate_size=22016,
                 num_hidden_layers=36, num_attention_heads=32, num_key_value_heads=32,
                 head_dim=128, hidden_act="silu", max_position_embeddings=128000,
                 initializer_range=0.02, rms_norm_eps=1e-6, use_cache=True,
                 tie_word_embeddings=False, rope_theta=5000000.0, rope_scaling=None,
                 attention_bias=False, attention_dropout=0.0, **kwargs):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.intermediate_size = intermediate_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.num_key_value_heads = num_key_value_heads
        self.head_dim = head_dim
        self.hidden_act = hidden_act
        self.max_position_embeddings = max_position_embeddings
        self.initializer_range = initializer_range
        self.rms_norm_eps = rms_norm_eps
        self.use_cache = use_cache
        self.rope_theta = rope_theta
        if rope_scaling is None:
            rope_scaling = {"rope_type": "default", "mrope_section": [24, 20, 20],
                            "mrope_interleaved": True}
        self.rope_scaling = rope_scaling
        self.attention_bias = attention_bias
        self.attention_dropout = attention_dropout
        super().__init__(tie_word_embeddings=tie_word_embeddings, **kwargs)

    @property
    def mrope_section(self):
        return (self.rope_scaling or {}).get("mrope_section", [24, 20, 20])


class Qwen3VLConfig(PretrainedConfig):
    model_type = "qwen3_vl"
    sub_configs = {"text_config": "auto", "vision_config": "auto"}

    def __init__(self, text_config=None, vision_config=None, image_token_id=151655,
                 video_token_id=151656, vision_start_token_id=151652,
                 vision_end_token_id=151653, tie_word_embeddings=False, **kwargs):
        if isinstance(vision_config, dict):
            vision_config = Qwen3VLVisionConfig(
                **{k: v for k, v in vision_config.items() if k != "model_type"})
        elif vision_config is None:
            vision_config = Qwen3VLVisionConfig()
        if isinstance(text_config, dict):
            text_config = Qwen3VLTextConfig(
                **{k: v for k, v in text_config.items() if k != "model_type"})
        elif text_config is None:
            text_config = Qwen3VLTextConfig()
        self.vision_config = vision_config
        self.text_config = text_config
        self.image_token_id = image_token_id
        self.video_token_id = video_token_id
        self.vision_start_token_id = vision_start_token_id
        self.vision_end_token_id = vision_end_token_id
        super().__init__(tie_word_embeddings=tie_word_embeddings, **kwargs)
