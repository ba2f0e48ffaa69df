"""BEiT config (reference src/transformers/models/beit/configuration_beit.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class BeitConfig(PretrainedConfig):
    model_type = "beit"

    def __init__(self, vocab_size=8192, hidden_size=768, num_hidden_layers=12,
                 num_attention_heads=12, intermediate_size=3072, hidden_act="gelu",
                 hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
                 initializer_range=0.02, layer_norm_eps=1e-12, image_size=224,
                 patch_size=16, num_channels=3, use_mask_token=False,
                 use_absolute_position_embeddings=False,
                 use_relative_position_bias=False,
                 use_shared_relative_position_bias=False, layer_scale_init_value=0.1,
                 drop_path_rate=0.1, use_mean_pooling=True, pool_scales=(1, 2, 3, 6),
                 use_auxiliary_head=True, auxiliary_loss_weight=0.4,
                 auxiliary_channels=256, auxiliary_num_convs=1,
                 auxiliary_concat_input=False, semantic_loss_ignore_index=255,
                 out_features=None, out_indices=None, add_fpn=False,
                 reshape_hidden_states=True, **kwargs):
        self.vocab_size = vocab_size
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
        self.use_mask_token = use_mask_token
        self.use_absolute_position_embeddings = use_absolute_position_embeddings
        self.use_relative_position_bias = use_relative_position_bias
        self.use_shared_relative_position_bias = use_shared_relative_position_bias
        self.layer_scale_init_value = layer_scale_init_value
        self.drop_path_rate = drop_path_rate
        self.use_mean_pooling = use_mean_pooling
        self.pool_scales = pool_scales
        self.use_auxiliary_head = use_auxiliary_head
        self.auxiliary_loss_weight = auxiliary_loss_weight
        self.auxiliary_channels = auxiliary_channels
        self.auxiliary_num_convs = auxiliary_num_convs
        self.auxiliary_concat_input = auxiliary_concat_input
        self.semantic_loss_ignore_index = semantic_loss_ignore_index
        self.out_features = out_features
        self.out_indices = out_indices
        self.add_fpn = add_fpn
        self.reshape_hidden_states = reshape_hidden_states
        super().__init__(**kwargs)
