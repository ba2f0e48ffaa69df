"""CLAP configs (reference src/transformers/models/clap/configuration_clap.py)."""

from __future__ import annotations

import math

from ...configuration_utils import PretrainedConfig


class ClapTextConfig(PretrainedConfig):
    model_type = "clap_text_model"

    def __init__(self, vocab_size=50265, hidden_size=768, num_hidden_layers=12,
                 num_attention_heads=12, intermediate_size=3072, hidden_act="gelu",
                 hidden_dropout_prob=0.1, attention_probs_dropout_prob=0.1,
                 max_position_embeddings=514, type_vocab_size=1, initializer_factor=1.0,
                 initializer_range=0.02,
                 layer_norm_eps=1e-12, projection_dim=512, pad_token_id=1, bos_token_id=0,
                 eos_token_id=2, projection_hidden_act="relu",
                 position_embedding_type="absolute", use_cache=True, **kwargs):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.intermediate_size = intermediate_size
        self.hidden_act = hidden_act
        self.hidden_dropout_prob = hidden_dropout_prob
        self.attention_probs_dropout_prob = attention_probs_dropout_prob
        self.max_position_embeddings = max_position_embeddings
        self.type_vocab_size = type_vocab_size
        self.initializer_factor = initializer_factor
        self.initializer_range = initializer_range
        self.layer_norm_eps = layer_norm_eps
        self.projection_dim = projection_dim
        self.projection_hidden_act = projection_hidden_act
        self.position_embedding_type = position_embedding_type
        self.use_cache = use_cache
        super().__init__(pad_token_id=pad_token_id, bos_token_id=bos_token_id,
                         eos_token_id=eos_token_id, **kwargs)


class ClapAudioConfig(PretrainedConfig):
    model_type = "clap_audio_model"

    def __init__(self, window_size=8, num_mel_bins=64, spec_size=256, hidden_act="gelu",
                 patch_size=4, patch_stride=(4, 4), num_classes=527, hidden_size=768,
                 projection_dim=512, depths=(2, 2, 6, 2), num_attention_heads=(4, 8, 16, 32),
                 enable_fusion=False, hidden_dropout_prob=0.1, fusion_type=None,
                 patch_embed_input_channels=1, flatten_patch_embeds=True,
                 patch_embeds_hidden_size=96, enable_patch_layer_norm=True,
                 drop_path_rate=0.0, attention_probs_dropout_prob=0.0, qkv_bias=True,
                 mlp_ratio=4.0, aff_block_r=4, num_hidden_layers=4,
                 projection_hidden_act="relu", layer_norm_eps=1e-5, initializer_factor=1.0,
                 initializer_range=0.02, **kwargs):
        self.window_size = window_size
        self.num_mel_bins = num_mel_bins
        self.spec_size = spec_size
        self.hidden_act = hidden_act
        self.patch_size = patch_size
        self.patch_stride = list(patch_stride) if isinstance(patch_stride, (list, tuple)) else [patch_stride, patch_stride]
        self.num_classes = num_classes
        self.hidden_size = hidden_size
        self.projection_dim = projection_dim
        self.depths = list(depths)
        self.num_attention_heads = list(num_attention_heads)
        self.enable_fusion = enable_fusion
        self.hidden_dropout_prob = hidden_dropout_prob
        self.fusion_type = fusion_type
        self.patch_embed_input_channels = patch_embed_input_channels
        self.flatten_patch_embeds = flatten_patch_embeds
        self.patch_embeds_hidden_size = patch_embeds_hidden_size
        self.enable_patch_layer_norm = enable_patch_layer_norm
        self.drop_path_rate = drop_path_rate
        self.attention_probs_dropout_prob = attention_probs_dropout_prob
        self.qkv_bias = qkv_bias
        self.mlp_ratio = mlp_ratio
        self.aff_block_r = aff_block_r
        self.num_hidden_layers = num_hidden_layers
        self.projection_hidden_act = projection_hidden_act
        self.layer_norm_eps = layer_norm_eps
        self.initializer_factor = initializer_factor
        self.initializer_range = initializer_range
        super().__init__(**kwargs)


class ClapConfig(PretrainedConfig):
    model_type = "clap"
    sub_configs = {"text_config": ClapTextConfig, "audio_config": ClapAudioConfig}

    def __init__(self, text_config=None, audio_config=None, logit_scale_init_value=14.2857,
                 projection_dim=512, projection_hidden_act="relu", initializer_factor=1.0,
                 **kwargs):
        if isinstance(text_config, dict):
            text_config = ClapTextConfig(**{k: v for k, v in text_config.items()
                                            if k != "model_type"})
        self.text_config = text_config or ClapTextConfig()
        if isinstance(audio_config, dict):
            audio_config = ClapAudioConfig(**{k: v for k, v in audio_config.items()
                                              if k != "model_type"})
        self.audio_config = audio_config or ClapAudioConfig()
        self.logit_scale_init_value = logit_scale_init_value
        self.projection_dim = projection_dim
        self.projection_hidden_act = projection_hidden_act
        self.initializer_factor = initializer_factor
        self.text_config.projection_dim = projection_dim
        self.audio_config.projection_dim = projection_dim
        self.logit_scale_init = math.log(logit_scale_init_value)
        super().__init__(**kwargs)
