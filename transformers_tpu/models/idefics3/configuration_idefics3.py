"""Idefics3 configs (reference src/transformers/models/idefics3/configuration_idefics3.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class Idefics3VisionConfig(PretrainedConfig):
    model_type = "idefics3_vision"

    def __init__(self, hidden_size=1152, intermediate_size=3072, num_hidden_layers=12,
                 num_attention_heads=16, num_channels=3, image_size=224, patch_size=32,
                 hidden_act="gelu_pytorch_tanh", layer_norm_eps=1e-6,
                 attention_dropout=0.0, initializer_range=0.02, **kwargs):
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
        super().__init__(**kwargs)


class Idefics3Config(PretrainedConfig):
    model_type = "idefics3"
    sub_configs = {"vision_config": Idefics3VisionConfig}

    def __init__(self, use_cache=True, image_token_id=128257, tie_word_embeddings=False,
                 vision_config=None, text_config=None, scale_factor=2,
                 pad_token_id=128002, **kwargs):
        self.use_cache = use_cache
        self.image_token_id = image_token_id
        self.scale_factor = scale_factor
        if isinstance(vision_config, dict) or vision_config is None:
            vision_config = Idefics3VisionConfig(**(vision_config or {}))
        self.vision_config = vision_config
        if isinstance(text_config, dict) or text_config is None:
            from ..llama.configuration_llama import LlamaConfig

            text_config = LlamaConfig(**(text_config or {}))
        self.text_config = text_config
        super().__init__(pad_token_id=pad_token_id,
                         tie_word_embeddings=tie_word_embeddings, **kwargs)
