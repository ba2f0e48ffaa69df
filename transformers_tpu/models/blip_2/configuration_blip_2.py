"""BLIP-2 config (reference src/transformers/models/blip_2/configuration_blip_2.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class Blip2VisionConfig(PretrainedConfig):
    model_type = "blip_2_vision_model"

    def __init__(self, hidden_size=1408, intermediate_size=6144, num_hidden_layers=39,
                 num_attention_heads=16, image_size=224, patch_size=14,
                 hidden_act="gelu", layer_norm_eps=1e-6, attention_dropout=0.0,
                 initializer_range=1e-10, qkv_bias=True, **kwargs):
        self.hidden_size = hidden_size
        self.intermediate_size = intermediate_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.image_size = image_size
        self.patch_size = patch_size
        self.hidden_act = hidden_act
        self.layer_norm_eps = layer_norm_eps
        self.attention_dropout = attention_dropout
        self.initializer_range = initializer_range
        self.qkv_bias = qkv_bias
        super().__init__(**kwargs)


class Blip2QFormerConfig(PretrainedConfig):
    model_type = "blip_2_qformer"

    def __init__(self, vocab_size=30522, hidden_size=768, num_hidden_layers=12,
                 num_attention_heads=12, intermediate_size=3072, hidden_act="gelu",
                 hidden_dropout_prob=0.1, attention_probs_dropout_prob=0.1,
                 max_position_embeddings=512, initializer_range=0.02,
                 layer_norm_eps=1e-12, pad_token_id=0, position_embedding_type="absolute",
                 cross_attention_frequency=2, encoder_hidden_size=1408, **kwargs):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.intermediate_size = intermediate_size
        self.hidden_act = hidden_act
        self.hidden_dropout_prob = hidden_dropout_prob
        self.attention_probs_dropout_prob = attention_probs_dropout_prob
        self.max_position_embeddings = max_position_embeddings
        self.initializer_range = initializer_range
        self.layer_norm_eps = layer_norm_eps
        self.position_embedding_type = position_embedding_type
        self.cross_attention_frequency = cross_attention_frequency
        self.encoder_hidden_size = encoder_hidden_size
        super().__init__(pad_token_id=pad_token_id, **kwargs)


class Blip2Config(PretrainedConfig):
    model_type = "blip-2"
    sub_configs = {"vision_config": Blip2VisionConfig,
                   "qformer_config": Blip2QFormerConfig, "text_config": "auto"}

    def __init__(self, vision_config=None, qformer_config=None, text_config=None,
                 num_query_tokens=32, image_token_index=None, image_text_hidden_size=256,
                 **kwargs):
        from ..auto.configuration_auto import AutoConfig

        self.vision_config = (Blip2VisionConfig(**vision_config)
                              if isinstance(vision_config, dict)
                              else vision_config or Blip2VisionConfig())
        self.qformer_config = (Blip2QFormerConfig(**qformer_config)
                               if isinstance(qformer_config, dict)
                               else qformer_config or Blip2QFormerConfig())
        if isinstance(text_config, dict):
            text_config = AutoConfig.for_model_type(
                text_config.get("model_type", "opt"),
                **{k: v for k, v in text_config.items() if k != "model_type"})
        elif text_config is None:
            from ..opt.configuration_opt import OPTConfig

            text_config = OPTConfig()
        self.text_config = text_config
        self.num_query_tokens = num_query_tokens
        self.image_token_index = image_token_index
        self.image_token_id = image_token_index
        self.image_text_hidden_size = image_text_hidden_size
        self.qformer_config.encoder_hidden_size = self.vision_config.hidden_size
        self.use_decoder_only_language_model = (
            text_config.model_type not in ("t5", "mt5", "umt5"))
        super().__init__(**kwargs)
