"""Hiera config (reference models/hiera/configuration_hiera.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class HieraConfig(PretrainedConfig):
    model_type = "hiera"
    attribute_map = {"num_hidden_layers": "num_layers"}

    def __init__(self, embed_dim=96, image_size=(224, 224), patch_size=(7, 7),
                 patch_stride=(4, 4), patch_padding=(3, 3), mlp_ratio=4.0,
                 depths=(2, 3, 16, 3), num_heads=(1, 2, 4, 8),
                 embed_dim_multiplier=2.0, num_query_pool=3, query_stride=(2, 2),
                 masked_unit_size=(8, 8),
                 masked_unit_attention=(True, True, False, False),
                 drop_path_rate=0.0, num_channels=3, hidden_act="gelu",
                 initializer_range=0.02, layer_norm_init=1.0,
                 layer_norm_eps=1e-6, decoder_hidden_size=None,
                 decoder_depth=None, decoder_num_heads=None,
                 normalize_pixel_loss=True, mask_ratio=0.6, out_features=None,
                 out_indices=None, **kwargs):
        self.embed_dim = embed_dim
        self.image_size = list(image_size)
        self.patch_size = list(patch_size)
        self.patch_stride = list(patch_stride)
        self.patch_padding = list(patch_padding)
        self.mlp_ratio = mlp_ratio
        self.depths = list(depths)
        self.num_heads = list(num_heads)
        self.num_layers = len(self.depths)
        self.embed_dim_multiplier = embed_dim_multiplier
        self.num_query_pool = num_query_pool
        self.query_stride = list(query_stride)
        self.masked_unit_size = list(masked_unit_size)
        self.masked_unit_attention = list(masked_unit_attention)
        self.drop_path_rate = drop_path_rate
        self.num_channels = num_channels
        self.hidden_act = hidden_act
        self.initializer_range = initializer_range
        self.layer_norm_init = layer_norm_init
        self.layer_norm_eps = layer_norm_eps
        self.decoder_hidden_size = decoder_hidden_size
        self.decoder_depth = decoder_depth
        self.decoder_num_heads = decoder_num_heads
        self.normalize_pixel_loss = normalize_pixel_loss
        self.mask_ratio = mask_ratio
        self.out_features = out_features
        self.out_indices = out_indices
        super().__init__(**kwargs)
