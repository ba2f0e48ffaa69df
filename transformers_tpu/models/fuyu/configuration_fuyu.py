"""Fuyu config (reference src/transformers/models/fuyu/configuration_fuyu.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class FuyuConfig(PretrainedConfig):
    model_type = "fuyu"
    sub_configs = {"text_config": "auto"}

    def __init__(self, vocab_size=262144, hidden_size=4096,
                 intermediate_size=16384, num_hidden_layers=36,
                 num_attention_heads=64, hidden_act="relu2",
                 max_position_embeddings=16384, image_size=300, patch_size=30,
                 num_channels=3, initializer_range=0.02, layer_norm_eps=1e-5,
                 use_cache=True, rope_theta=25000.0, qk_layernorm=True,
                 hidden_dropout=0.0, attention_dropout=0.0,
                 image_token_id=71011, text_config=None, **kwargs):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.intermediate_size = intermediate_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.hidden_act = hidden_act
        self.max_position_embeddings = max_position_embeddings
        self.image_size = image_size
        self.patch_size = patch_size
        self.num_channels = num_channels
        self.initializer_range = initializer_range
        self.layer_norm_eps = layer_norm_eps
        self.use_cache = use_cache
        self.rope_theta = rope_theta
        self.qk_layernorm = qk_layernorm
        self.hidden_dropout = hidden_dropout
        self.attention_dropout = attention_dropout
        self.image_token_id = image_token_id
        if text_config is None:
            text_config = {
                "model_type": "persimmon", "vocab_size": vocab_size,
                "max_position_embeddings": max_position_embeddings,
                "hidden_size": hidden_size, "intermediate_size": intermediate_size,
                "num_hidden_layers": num_hidden_layers,
                "num_attention_heads": num_attention_heads,
                "hidden_act": hidden_act, "initializer_range": initializer_range,
                "layer_norm_eps": layer_norm_eps, "use_cache": use_cache,
                "rope_theta": rope_theta, "qk_layernorm": qk_layernorm,
                "hidden_dropout": hidden_dropout,
                "attention_dropout": attention_dropout,
                "tie_word_embeddings": kwargs.get("tie_word_embeddings", False),
            }
        if isinstance(text_config, dict):
            from ..auto.configuration_auto import AutoConfig

            text_config = AutoConfig.for_model_type(
                text_config.get("model_type", "persimmon"),
                **{k: v for k, v in text_config.items() if k != "model_type"})
        self.text_config = text_config
        kwargs.setdefault("tie_word_embeddings", False)
        kwargs.setdefault("bos_token_id", 1)
        kwargs.setdefault("eos_token_id", 2)
        super().__init__(**kwargs)
