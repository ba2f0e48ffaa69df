"""Kosmos-2 configs (reference src/transformers/models/kosmos2/configuration_kosmos2.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig
from ..clip.configuration_clip import CLIPVisionConfig


class Kosmos2TextConfig(PretrainedConfig):
    model_type = "kosmos_2_text_model"
    attribute_map = {"num_attention_heads": "attention_heads",
                     "hidden_size": "embed_dim", "num_hidden_layers": "layers"}

    def __init__(self, vocab_size=65037, max_position_embeddings=2048,
                 embed_dim=2048, layers=24, ffn_dim=8192, attention_heads=32,
                 activation_function="gelu", dropout=0.1, attention_dropout=0.1,
                 activation_dropout=0.0, layerdrop=0.0, layer_norm_eps=1e-5,
                 init_std=0.02, scale_embedding=True, use_cache=True,
                 pad_token_id=1, bos_token_id=0, eos_token_id=2, **kwargs):
        self.vocab_size = vocab_size
        self.max_position_embeddings = max_position_embeddings
        self.embed_dim = embed_dim
        self.layers = layers
        self.ffn_dim = ffn_dim
        self.attention_heads = attention_heads
        self.activation_function = activation_function
        self.dropout = dropout
        self.attention_dropout = attention_dropout
        self.activation_dropout = activation_dropout
        self.layerdrop = layerdrop
        self.layer_norm_eps = layer_norm_eps
        self.init_std = init_std
        self.scale_embedding = scale_embedding
        self.use_cache = use_cache
        kwargs.setdefault("tie_word_embeddings", True)
        super().__init__(pad_token_id=pad_token_id, bos_token_id=bos_token_id,
                         eos_token_id=eos_token_id, **kwargs)


class Kosmos2VisionConfig(CLIPVisionConfig):
    model_type = "kosmos_2_vision_model"


class Kosmos2Config(PretrainedConfig):
    model_type = "kosmos-2"
    sub_configs = {"text_config": Kosmos2TextConfig,
                   "vision_config": Kosmos2VisionConfig}

    def __init__(self, text_config=None, vision_config=None,
                 latent_query_num=64, **kwargs):
        self.text_config = (Kosmos2TextConfig(**(text_config or {}))
                            if not isinstance(text_config, Kosmos2TextConfig)
                            else text_config)
        self.vision_config = (Kosmos2VisionConfig(**(vision_config or {}))
                              if not isinstance(vision_config, Kosmos2VisionConfig)
                              else vision_config)
        self.latent_query_num = latent_query_num
        kwargs.setdefault("tie_word_embeddings", True)
        super().__init__(**kwargs)
