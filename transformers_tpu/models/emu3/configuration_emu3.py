"""Emu3 configs (reference models/emu3/configuration_emu3.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class Emu3VQVAEConfig(PretrainedConfig):
    model_type = "emu3_vqgan"
    base_config_key = "vq_config"

    def __init__(self, codebook_size=32768, embed_dim=4, latent_channels=4,
                 double_latent=False, in_channels=3, out_channels=3,
                 temporal_downsample_factor=4, base_channels=256,
                 channel_multiplier=(1, 2, 2, 4), num_res_blocks=2,
                 attn_resolutions=(3,), hidden_size=1024,
                 num_attention_heads=1, attention_dropout=0.0, **kwargs):
        super().__init__(**kwargs)
        self.codebook_size = codebook_size
        self.embed_dim = embed_dim
        self.latent_channels = latent_channels
        self.double_latent = double_latent
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.temporal_downsample_factor = temporal_downsample_factor
        self.base_channels = base_channels
        self.channel_multiplier = list(channel_multiplier)
        self.num_res_blocks = num_res_blocks
        self.attn_resolutions = list(attn_resolutions)
        self.hidden_size = hidden_size
        self.num_attention_heads = num_attention_heads
        self.attention_dropout = attention_dropout
        self.initializer_range = 0.02


class Emu3TextConfig(PretrainedConfig):
    model_type = "emu3_text_model"
    base_config_key = "text_config"

    def __init__(self, vocab_size=184622, hidden_size=4096,
                 intermediate_size=14336, num_hidden_layers=32,
                 num_attention_heads=32, num_key_value_heads=8,
                 hidden_act="silu", max_position_embeddings=9216,
                 rms_norm_eps=1e-5, use_cache=True, pad_token_id=151643,
                 bos_token_id=151849, eos_token_id=151850,
                 tie_word_embeddings=False, rope_theta=1000000.0,
                 rope_scaling=None, mlp_bias=False, attention_bias=False,
                 attention_dropout=0.1, initializer_range=0.02, **kwargs):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.intermediate_size = intermediate_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.num_key_value_heads = num_key_value_heads
        self.hidden_act = hidden_act
        self.max_position_embeddings = max_position_embeddings
        self.rms_norm_eps = rms_norm_eps
        self.use_cache = use_cache
        self.rope_theta = rope_theta
        self.rope_scaling = rope_scaling
        self.mlp_bias = mlp_bias
        self.attention_bias = attention_bias
        self.attention_dropout = attention_dropout
        self.initializer_range = initializer_range
        super().__init__(pad_token_id=pad_token_id, bos_token_id=bos_token_id,
                         eos_token_id=eos_token_id,
                         tie_word_embeddings=tie_word_embeddings, **kwargs)


class Emu3Config(PretrainedConfig):
    model_type = "emu3"
    sub_configs = {"vq_config": Emu3VQVAEConfig, "text_config": Emu3TextConfig}

    def __init__(self, vq_config=None, text_config=None, vocabulary_map=None,
                 **kwargs):
        if vq_config is None:
            vq_config = Emu3VQVAEConfig()
        elif isinstance(vq_config, dict):
            vq_config = Emu3VQVAEConfig(**{k: v for k, v in vq_config.items()
                                           if k != "model_type"})
        if text_config is None:
            text_config = Emu3TextConfig()
        elif isinstance(text_config, dict):
            text_config = Emu3TextConfig(**{k: v for k, v in text_config.items()
                                            if k != "model_type"})
        self.vq_config = vq_config
        self.text_config = text_config
        self.vocabulary_map = vocabulary_map
        super().__init__(**kwargs)
