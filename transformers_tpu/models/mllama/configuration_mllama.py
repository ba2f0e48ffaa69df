"""Mllama (Llama 3.2 Vision) configs (reference
src/transformers/models/mllama/configuration_mllama.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class MllamaVisionConfig(PretrainedConfig):
    model_type = "mllama_vision_model"
    base_config_key = "vision_config"
    attribute_map = {"num_attention_heads": "attention_heads"}

    def __init__(
        self,
        hidden_size=1280,
        hidden_act="gelu",
        num_hidden_layers=32,
        num_global_layers=8,
        attention_heads=16,
        num_channels=3,
        intermediate_size=5120,
        vision_output_dim=7680,
        image_size=448,
        patch_size=14,
        norm_eps=1e-5,
        max_num_tiles=4,
        intermediate_layers_indices=None,
        supported_aspect_ratios=None,
        initializer_range=0.02,
        **kwargs,
    ):
        self.hidden_size = hidden_size
        self.hidden_act = hidden_act
        self.num_hidden_layers = num_hidden_layers
        self.num_global_layers = num_global_layers
        self.attention_heads = attention_heads
        self.num_channels = num_channels
        self.intermediate_size = intermediate_size
        self.vision_output_dim = vision_output_dim
        self.image_size = image_size
        self.patch_size = patch_size
        self.norm_eps = norm_eps
        self.max_num_tiles = max_num_tiles
        self.intermediate_layers_indices = (
            intermediate_layers_indices if intermediate_layers_indices is not None
            else [3, 7, 15, 23, 30])
        self.supported_aspect_ratios = (
            supported_aspect_ratios if supported_aspect_ratios is not None
            else [[1, 1], [1, 2], [1, 3], [1, 4], [2, 1], [2, 2], [3, 1], [4, 1]])
        self.initializer_range = initializer_range
        super().__init__(**kwargs)

    @property
    def max_aspect_ratio_id(self) -> int:
        return len(self.supported_aspect_ratios)


class MllamaTextConfig(PretrainedConfig):
    model_type = "mllama_text_model"
    base_config_key = "text_config"

    def __init__(
        self,
        vocab_size=128256,
        hidden_size=4096,
        hidden_act="silu",
        num_hidden_layers=40,
        num_attention_heads=32,
        num_key_value_heads=8,
        intermediate_size=14336,
        rope_theta=500000.0,
        rope_scaling=None,
        rms_norm_eps=1e-5,
        max_position_embeddings=131072,
        initializer_range=0.02,
        use_cache=True,
        tie_word_embeddings=False,
        cross_attention_layers=None,
        dropout=0.0,
        bos_token_id=128000,
        eos_token_id=128001,
        pad_token_id=128004,
        **kwargs,
    ):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.hidden_act = hidden_act
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.num_key_value_heads = num_key_value_heads
        self.intermediate_size = intermediate_size
        self.rope_theta = rope_theta
        if isinstance(rope_scaling, dict) and rope_scaling.get("rope_type", rope_scaling.get("type")) == "default":
            rope_scaling = None
        self.rope_scaling = rope_scaling
        self.rms_norm_eps = rms_norm_eps
        self.max_position_embeddings = max_position_embeddings
        self.initializer_range = initializer_range
        self.use_cache = use_cache
        self.cross_attention_layers = (
            cross_attention_layers if cross_attention_layers is not None
            else [3, 8, 13, 18, 23, 28, 33, 38])
        self.dropout = dropout
        self.head_dim = hidden_size // num_attention_heads
        self.attention_bias = False
        super().__init__(bos_token_id=bos_token_id, eos_token_id=eos_token_id,
                         pad_token_id=pad_token_id,
                         tie_word_embeddings=tie_word_embeddings, **kwargs)


class MllamaConfig(PretrainedConfig):
    model_type = "mllama"
    sub_configs = {"text_config": "auto", "vision_config": "auto"}

    def __init__(self, vision_config=None, text_config=None,
                 image_token_index=128256, **kwargs):
        if isinstance(vision_config, dict):
            vision_config = MllamaVisionConfig(
                **{k: v for k, v in vision_config.items() if k != "model_type"})
        elif vision_config is None:
            vision_config = MllamaVisionConfig()
        if isinstance(text_config, dict):
            text_config = MllamaTextConfig(
                **{k: v for k, v in text_config.items() if k != "model_type"})
        elif text_config is None:
            text_config = MllamaTextConfig()
        self.vision_config = vision_config
        self.text_config = text_config
        self.image_token_index = image_token_index
        self.image_token_id = image_token_index
        super().__init__(**kwargs)
