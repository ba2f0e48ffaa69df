"""InternVL configs (reference
src/transformers/models/internvl/configuration_internvl.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig
from ...models.auto.configuration_auto import get_config_class


class InternVLVisionConfig(PretrainedConfig):
    model_type = "internvl_vision"
    base_config_key = "vision_config"

    def __init__(self, hidden_size=1024, num_hidden_layers=24, num_attention_heads=16,
                 attention_bias=False, use_qk_norm=False, intermediate_size=4096,
                 hidden_act="gelu", norm_type="layer_norm", layer_norm_eps=1e-6,
                 image_size=None, patch_size=None, num_channels=3, use_mask_token=False,
                 use_absolute_position_embeddings=True, layer_scale_init_value=0.1,
                 use_mean_pooling=True, initializer_range=0.02,
                 hidden_dropout_prob=0.0, attention_dropout=0.0,
                 projection_dropout=0.0, **kwargs):
        self.hidden_size = hidden_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.attention_bias = attention_bias
        self.use_qk_norm = use_qk_norm
        self.intermediate_size = intermediate_size
        self.hidden_act = hidden_act
        self.norm_type = norm_type
        self.layer_norm_eps = layer_norm_eps
        image_size = image_size if image_size is not None else [448, 448]
        patch_size = patch_size if patch_size is not None else [14, 14]
        self.image_size = image_size if isinstance(image_size, (list, tuple)) else [image_size, image_size]
        self.patch_size = patch_size if isinstance(patch_size, (list, tuple)) else [patch_size, patch_size]
        self.num_channels = num_channels
        self.use_mask_token = use_mask_token
        self.use_absolute_position_embeddings = use_absolute_position_embeddings
        self.layer_scale_init_value = layer_scale_init_value
        self.use_mean_pooling = use_mean_pooling
        self.initializer_range = initializer_range
        self.hidden_dropout_prob = hidden_dropout_prob
        self.attention_dropout = attention_dropout
        self.projection_dropout = projection_dropout
        super().__init__(**kwargs)


class InternVLConfig(PretrainedConfig):
    model_type = "internvl"
    sub_configs = {"text_config": "auto", "vision_config": "auto"}

    def __init__(self, vision_config=None, text_config=None, image_token_id=151667,
                 image_seq_length=256, downsample_ratio=0.5, projector_hidden_act="gelu",
                 vision_feature_layer=-1, vision_feature_select_strategy="default",
                 **kwargs):
        if isinstance(vision_config, dict):
            vision_config = InternVLVisionConfig(
                **{k: v for k, v in vision_config.items() if k != "model_type"})
        elif vision_config is None:
            vision_config = InternVLVisionConfig()
        if isinstance(text_config, dict):
            model_type = text_config.get("model_type", "qwen2")
            cls = get_config_class(model_type)
            text_config = cls(**{k: v for k, v in text_config.items() if k != "model_type"})
        elif text_config is None:
            text_config = get_config_class("qwen2")()
        self.vision_config = vision_config
        self.text_config = text_config
        self.image_token_id = image_token_id
        self.image_seq_length = image_seq_length
        self.downsample_ratio = downsample_ratio
        self.projector_hidden_act = projector_hidden_act
        self.vision_feature_layer = vision_feature_layer
        self.vision_feature_select_strategy = vision_feature_select_strategy
        super().__init__(**kwargs)
