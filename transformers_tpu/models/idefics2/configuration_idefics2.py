"""Idefics2 configs (reference
src/transformers/models/idefics2/configuration_idefics2.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig
from ..idefics3.configuration_idefics3 import Idefics3VisionConfig


class Idefics2VisionConfig(Idefics3VisionConfig):
    model_type = "idefics2_vision"


class Idefics2PerceiverConfig(PretrainedConfig):
    model_type = "idefics2_perceiver"

    def __init__(self, hidden_act="silu", hidden_size=4096, rms_norm_eps=1e-6,
                 resampler_n_latents=64, resampler_depth=3, resampler_n_heads=16,
                 resampler_head_dim=96, num_key_value_heads=4, attention_dropout=0.0,
                 initializer_range=0.02, **kwargs):
        self.hidden_act = hidden_act
        self.hidden_size = hidden_size
        self.rms_norm_eps = rms_norm_eps
        self.resampler_n_latents = resampler_n_latents
        self.resampler_depth = resampler_depth
        self.resampler_n_heads = resampler_n_heads
        self.resampler_head_dim = resampler_head_dim
        self.num_key_value_heads = num_key_value_heads
        self.attention_dropout = attention_dropout
        self.initializer_range = initializer_range
        super().__init__(**kwargs)


class Idefics2Config(PretrainedConfig):
    model_type = "idefics2"
    sub_configs = {"text_config": "auto", "vision_config": Idefics2VisionConfig,
                   "perceiver_config": Idefics2PerceiverConfig}

    def __init__(self, use_cache=True, image_token_id=32001, tie_word_embeddings=False,
                 vision_config=None, perceiver_config=None, text_config=None, **kwargs):
        self.use_cache = use_cache
        self.image_token_id = image_token_id
        if isinstance(vision_config, dict) or vision_config is None:
            vision_config = Idefics2VisionConfig(**(vision_config or {}))
        self.vision_config = vision_config
        if isinstance(perceiver_config, dict) or perceiver_config is None:
            perceiver_config = Idefics2PerceiverConfig(**(perceiver_config or {}))
        self.perceiver_config = perceiver_config
        if isinstance(text_config, dict) or text_config is None:
            from ..auto.configuration_auto import get_config_class

            model_type = (text_config or {}).get("model_type", "mistral")
            cls = get_config_class(model_type)
            text_config = cls(**{k: v for k, v in (text_config or {}).items()
                                 if k != "model_type"})
        self.text_config = text_config
        super().__init__(tie_word_embeddings=tie_word_embeddings, **kwargs)
