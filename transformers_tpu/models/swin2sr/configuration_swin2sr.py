"""Swin2SR config (reference models/swin2sr/configuration_swin2sr.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class Swin2SRConfig(PretrainedConfig):
    model_type = "swin2sr"

    def __init__(self, image_size=64, patch_size=1, num_channels=3,
                 num_channels_out=None, embed_dim=180, depths=(6, 6, 6, 6, 6, 6),
                 num_heads=(6, 6, 6, 6, 6, 6), window_size=8, mlp_ratio=2.0,
                 qkv_bias=True, hidden_dropout_prob=0.0,
                 attention_probs_dropout_prob=0.0, drop_path_rate=0.1,
                 hidden_act="gelu", use_absolute_embeddings=False,
                 initializer_range=0.02, layer_norm_eps=1e-5, upscale=2,
                 img_range=1.0, resi_connection="1conv",
                 upsampler="pixelshuffle", **kwargs):
        self.image_size = image_size
        self.patch_size = patch_size
        self.num_channels = num_channels
        self.num_channels_out = (num_channels if num_channels_out is None
                                 else num_channels_out)
        self.embed_dim = embed_dim
        self.depths = list(depths)
        self.num_layers = len(depths)
        self.num_heads = list(num_heads)
        self.window_size = window_size
        self.mlp_ratio = mlp_ratio
        self.qkv_bias = qkv_bias
        self.hidden_dropout_prob = hidden_dropout_prob
        self.attention_probs_dropout_prob = attention_probs_dropout_prob
        self.drop_path_rate = drop_path_rate
        self.hidden_act = hidden_act
        self.use_absolute_embeddings = use_absolute_embeddings
        self.initializer_range = initializer_range
        self.layer_norm_eps = layer_norm_eps
        self.upscale = upscale
        self.img_range = img_range
        self.resi_connection = resi_connection
        self.upsampler = upsampler
        super().__init__(**kwargs)
