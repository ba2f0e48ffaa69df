"""FLAVA configs (reference models/flava/configuration_flava.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class FlavaImageConfig(PretrainedConfig):
    model_type = "flava_image_model"

    def __init__(self, hidden_size=768, num_hidden_layers=12,
                 num_attention_heads=12, intermediate_size=3072,
                 hidden_act="gelu", hidden_dropout_prob=0.0,
                 attention_probs_dropout_prob=0.0, initializer_range=0.02,
                 layer_norm_eps=1e-12, image_size=224, patch_size=16,
                 num_channels=3, qkv_bias=True, mask_token=True,
                 vocab_size=8192, **kwargs):
        super().__init__(**kwargs)
        self.hidden_size = hidden_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.intermediate_size = intermediate_size
        self.hidden_act = hidden_act
        self.hidden_dropout_prob = hidden_dropout_prob
        self.attention_probs_dropout_prob = attention_probs_dropout_prob
        self.initializer_range = initializer_range
        self.layer_norm_eps = layer_norm_eps
        self.image_size = image_size
        self.patch_size = patch_size
        self.num_channels = num_channels
        self.qkv_bias = qkv_bias
        self.mask_token = mask_token
        self.vocab_size = vocab_size


class FlavaTextConfig(PretrainedConfig):
    model_type = "flava_text_model"

    def __init__(self, vocab_size=30522, type_vocab_size=2,
                 max_position_embeddings=512, position_embedding_type="absolute",
                 hidden_size=768, num_hidden_layers=12, num_attention_heads=12,
                 intermediate_size=3072, hidden_act="gelu",
                 hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
                 initializer_range=0.02, layer_norm_eps=1e-12, pad_token_id=0,
                 qkv_bias=True, **kwargs):
        super().__init__(pad_token_id=pad_token_id, **kwargs)
        self.vocab_size = vocab_size
        self.type_vocab_size = type_vocab_size
        self.max_position_embeddings = max_position_embeddings
        self.position_embedding_type = position_embedding_type
        self.hidden_size = hidden_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.intermediate_size = intermediate_size
        self.hidden_act = hidden_act
        self.hidden_dropout_prob = hidden_dropout_prob
        self.attention_probs_dropout_prob = attention_probs_dropout_prob
        self.initializer_range = initializer_range
        self.layer_norm_eps = layer_norm_eps
        self.qkv_bias = qkv_bias


class FlavaMultimodalConfig(PretrainedConfig):
    model_type = "flava_multimodal_model"

    def __init__(self, hidden_size=768, num_hidden_layers=6,
                 num_attention_heads=12, intermediate_size=3072,
                 hidden_act="gelu", hidden_dropout_prob=0.0,
                 attention_probs_dropout_prob=0.0, initializer_range=0.02,
                 layer_norm_eps=1e-12, qkv_bias=True, use_cls_token=True,
                 **kwargs):
        super().__init__(**kwargs)
        self.hidden_size = hidden_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.intermediate_size = intermediate_size
        self.hidden_act = hidden_act
        self.hidden_dropout_prob = hidden_dropout_prob
        self.attention_probs_dropout_prob = attention_probs_dropout_prob
        self.initializer_range = initializer_range
        self.layer_norm_eps = layer_norm_eps
        self.qkv_bias = qkv_bias
        self.use_cls_token = use_cls_token


class FlavaImageCodebookConfig(PretrainedConfig):
    model_type = "flava_image_codebook"

    def __init__(self, num_groups=4, input_channels=3, num_blocks_per_group=2,
                 hidden_size=256, vocab_size=8192, freeze=True,
                 initializer_range=0.02, **kwargs):
        super().__init__(**kwargs)
        self.num_groups = num_groups
        self.input_channels = input_channels
        self.num_blocks_per_group = num_blocks_per_group
        self.hidden_size = hidden_size
        self.vocab_size = vocab_size
        self.freeze = freeze
        self.initializer_range = initializer_range


class FlavaConfig(PretrainedConfig):
    model_type = "flava"
    sub_configs = {"image_config": FlavaImageConfig,
                   "text_config": FlavaTextConfig,
                   "multimodal_config": FlavaMultimodalConfig,
                   "image_codebook_config": FlavaImageCodebookConfig}

    def __init__(self, image_config=None, text_config=None,
                 multimodal_config=None, image_codebook_config=None,
                 hidden_size=768, layer_norm_eps=1e-12, projection_dim=768,
                 init_codebook=True, logit_scale_init_value=2.6592,
                 initializer_range=0.02, ce_ignore_index=-100, mim_weight=1.0,
                 mlm_weight=1.0, global_contrastive_weight=1.0, itm_weight=1.0,
                 mmm_image_weight=1.0, mmm_text_weight=1.0,
                 global_backprop_contrastive=True,
                 skip_unmasked_multimodal_encoder=True, return_loss=True,
                 **kwargs):
        super().__init__(**kwargs)

        def _sub(cls, value):
            if isinstance(value, cls):
                return value
            value = {k: v for k, v in (value or {}).items() if k != "model_type"}
            return cls(**value)

        self.image_config = _sub(FlavaImageConfig, image_config)
        self.text_config = _sub(FlavaTextConfig, text_config)
        self.multimodal_config = _sub(FlavaMultimodalConfig, multimodal_config)
        self.image_codebook_config = _sub(FlavaImageCodebookConfig,
                                          image_codebook_config)
        self.hidden_size = hidden_size
        self.layer_norm_eps = layer_norm_eps
        self.projection_dim = projection_dim
        self.init_codebook = init_codebook
        self.logit_scale_init_value = logit_scale_init_value
        self.initializer_range = initializer_range
        self.ce_ignore_index = ce_ignore_index
        self.mim_weight = mim_weight
        self.mlm_weight = mlm_weight
        self.global_contrastive_weight = global_contrastive_weight
        self.itm_weight = itm_weight
        self.mmm_image_weight = mmm_image_weight
        self.mmm_text_weight = mmm_text_weight
        self.global_backprop_contrastive = global_backprop_contrastive
        self.skip_unmasked_multimodal_encoder = skip_unmasked_multimodal_encoder
        self.return_loss = return_loss
