"""Florence-2 configs (reference models/florence2/configuration_florence2.py):
a DaViT vision backbone paired with a BART language model."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig
from ..auto.configuration_auto import get_config_class


class Florence2VisionConfig(PretrainedConfig):
    model_type = "florence2_vision"

    def __init__(self, in_channels=3, depths=(1, 1, 9, 1),
                 patch_size=(7, 3, 3, 3), patch_stride=(4, 2, 2, 2),
                 patch_padding=(3, 1, 1, 1),
                 patch_prenorm=(False, True, True, True),
                 embed_dim=(128, 256, 512, 1024), num_heads=(4, 8, 16, 32),
                 num_groups=(4, 8, 16, 32), window_size=12, mlp_ratio=4.0,
                 qkv_bias=True, drop_path_rate=0.1, projection_dim=1024,
                 max_position_embeddings=50, max_temporal_embeddings=100,
                 activation_function="gelu", initializer_range=0.02, **kwargs):
        self.in_channels = in_channels
        self.depths = list(depths)
        self.patch_size = list(patch_size)
        self.patch_stride = list(patch_stride)
        self.patch_padding = list(patch_padding)
        self.patch_prenorm = list(patch_prenorm)
        self.embed_dim = list(embed_dim)
        self.num_heads = list(num_heads)
        self.num_groups = list(num_groups)
        self.window_size = window_size
        self.mlp_ratio = mlp_ratio
        self.qkv_bias = qkv_bias
        self.drop_path_rate = drop_path_rate
        self.projection_dim = projection_dim
        self.max_position_embeddings = max_position_embeddings
        self.max_temporal_embeddings = max_temporal_embeddings
        self.activation_function = activation_function
        self.initializer_range = initializer_range
        super().__init__(**kwargs)


class Florence2Config(PretrainedConfig):
    model_type = "florence2"
    sub_configs = {"vision_config": Florence2VisionConfig,
                   "text_config": "auto"}

    def __init__(self, vision_config=None, text_config=None,
                 image_token_id=51289, is_encoder_decoder=True, **kwargs):
        if isinstance(vision_config, dict):
            vision_config = Florence2VisionConfig(**vision_config)
        elif vision_config is None:
            vision_config = Florence2VisionConfig()
        if isinstance(text_config, dict):
            text_config = get_config_class(
                text_config.get("model_type", "bart"))(**text_config)
        elif text_config is None:
            text_config = get_config_class("bart")()
        self.vision_config = vision_config
        self.text_config = text_config
        self.image_token_id = image_token_id
        kwargs.setdefault("decoder_start_token_id",
                          text_config.decoder_start_token_id)
        kwargs.setdefault("pad_token_id", text_config.pad_token_id)
        kwargs.setdefault("eos_token_id", text_config.eos_token_id)
        kwargs.setdefault("bos_token_id", text_config.bos_token_id)
        super().__init__(is_encoder_decoder=is_encoder_decoder, **kwargs)
