"""DINOv3 ViT config (reference models/dinov3_vit/configuration_dinov3_vit.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class DINOv3ViTConfig(PretrainedConfig):
    model_type = "dinov3_vit"

    def __init__(self, patch_size=16, hidden_size=384, intermediate_size=1536,
                 num_hidden_layers=12, num_attention_heads=6, hidden_act="gelu",
                 attention_dropout=0.0, initializer_range=0.02,
                 layer_norm_eps=1e-5, rope_theta=100.0, image_size=224,
                 num_channels=3, query_bias=True, key_bias=False,
                 value_bias=True, proj_bias=True, mlp_bias=True,
                 layerscale_value=1.0, drop_path_rate=0.0, use_gated_mlp=False,
                 num_register_tokens=0, pos_embed_shift=None,
                 pos_embed_jitter=None, pos_embed_rescale=2.0, **kwargs):
        super().__init__(**kwargs)
        self.patch_size = patch_size
        self.hidden_size = hidden_size
        self.intermediate_size = intermediate_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.hidden_act = hidden_act
        self.attention_dropout = attention_dropout
        self.initializer_range = initializer_range
        self.layer_norm_eps = layer_norm_eps
        self.rope_theta = rope_theta
        self.image_size = image_size
        self.num_channels = num_channels
        self.query_bias = query_bias
        self.key_bias = key_bias
        self.value_bias = value_bias
        self.proj_bias = proj_bias
        self.mlp_bias = mlp_bias
        self.layerscale_value = layerscale_value
        self.drop_path_rate = drop_path_rate
        self.use_gated_mlp = use_gated_mlp
        self.num_register_tokens = num_register_tokens
        self.pos_embed_shift = pos_embed_shift
        self.pos_embed_jitter = pos_embed_jitter
        self.pos_embed_rescale = pos_embed_rescale
