"""GroupViT configs (reference src/transformers/models/groupvit/configuration_groupvit.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class GroupViTTextConfig(PretrainedConfig):
    model_type = "groupvit_text_model"

    def __init__(self, vocab_size=49408, hidden_size=256, intermediate_size=1024,
                 num_hidden_layers=12, num_attention_heads=4,
                 max_position_embeddings=77, hidden_act="quick_gelu",
                 layer_norm_eps=1e-5, dropout=0.0, attention_dropout=0.0,
                 initializer_range=0.02, initializer_factor=1.0,
                 pad_token_id=1, bos_token_id=49406, eos_token_id=49407,
                 **kwargs):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.intermediate_size = intermediate_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.max_position_embeddings = max_position_embeddings
        self.hidden_act = hidden_act
        self.layer_norm_eps = layer_norm_eps
        self.dropout = dropout
        self.attention_dropout = attention_dropout
        self.initializer_range = initializer_range
        self.initializer_factor = initializer_factor
        super().__init__(pad_token_id=pad_token_id, bos_token_id=bos_token_id,
                         eos_token_id=eos_token_id, **kwargs)


class GroupViTVisionConfig(PretrainedConfig):
    model_type = "groupvit_vision_model"

    def __init__(self, hidden_size=384, intermediate_size=1536,
                 depths=(6, 3, 3), num_hidden_layers=12,
                 num_group_tokens=(64, 8, 0), num_output_groups=(64, 8, 8),
                 num_attention_heads=6, image_size=224, patch_size=16,
                 num_channels=3, hidden_act="gelu", layer_norm_eps=1e-5,
                 dropout=0.0, attention_dropout=0.0, initializer_range=0.02,
                 initializer_factor=1.0, assign_eps=1.0,
                 assign_mlp_ratio=(0.5, 4), **kwargs):
        self.hidden_size = hidden_size
        self.intermediate_size = intermediate_size
        self.depths = list(depths)
        self.num_hidden_layers = num_hidden_layers
        self.num_group_tokens = list(num_group_tokens)
        self.num_output_groups = list(num_output_groups)
        self.num_attention_heads = num_attention_heads
        self.image_size = image_size
        self.patch_size = patch_size
        self.num_channels = num_channels
        self.hidden_act = hidden_act
        self.layer_norm_eps = layer_norm_eps
        self.dropout = dropout
        self.attention_dropout = attention_dropout
        self.initializer_range = initializer_range
        self.initializer_factor = initializer_factor
        self.assign_eps = assign_eps
        self.assign_mlp_ratio = list(assign_mlp_ratio)
        super().__init__(**kwargs)


class GroupViTConfig(PretrainedConfig):
    model_type = "groupvit"
    sub_configs = {"text_config": GroupViTTextConfig,
                   "vision_config": GroupViTVisionConfig}

    def __init__(self, text_config=None, vision_config=None, projection_dim=256,
                 projection_intermediate_dim=4096, logit_scale_init_value=2.6592,
                 **kwargs):
        if isinstance(text_config, dict) or text_config is None:
            text_config = GroupViTTextConfig(**(text_config or {}))
        if isinstance(vision_config, dict) or vision_config is None:
            vision_config = GroupViTVisionConfig(**(vision_config or {}))
        self.text_config = text_config
        self.vision_config = vision_config
        self.projection_dim = projection_dim
        self.projection_intermediate_dim = projection_intermediate_dim
        self.logit_scale_init_value = logit_scale_init_value
        self.initializer_range = 0.02
        self.initializer_factor = 1.0
        super().__init__(**kwargs)
