"""Chameleon configs (reference
src/transformers/models/chameleon/configuration_chameleon.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class ChameleonVQVAEConfig(PretrainedConfig):
    model_type = "chameleon_vqgan"
    base_config_key = "vq_config"

    def __init__(self, embed_dim=256, num_embeddings=8192, double_latent=False,
                 latent_channels=256, resolution=512, in_channels=3,
                 base_channels=128, channel_multiplier=None, num_res_blocks=2,
                 attn_resolutions=None, dropout=0.0, attn_type="vanilla",
                 initializer_range=0.02, **kwargs):
        self.embed_dim = embed_dim
        self.num_embeddings = num_embeddings
        self.double_latent = double_latent
        self.latent_channels = latent_channels
        self.resolution = resolution
        self.in_channels = in_channels
        self.base_channels = base_channels
        self.channel_multiplier = (channel_multiplier if channel_multiplier is not None
                                   else [1, 1, 2, 2, 4])
        self.num_res_blocks = num_res_blocks
        self.attn_resolutions = attn_resolutions
        self.dropout = dropout
        self.attn_type = attn_type
        self.initializer_range = initializer_range
        super().__init__(**kwargs)


class ChameleonConfig(PretrainedConfig):
    model_type = "chameleon"
    sub_configs = {"vq_config": ChameleonVQVAEConfig}

    def __init__(self, vocab_size=65536, hidden_size=4096, intermediate_size=11008,
                 num_hidden_layers=32, num_attention_heads=32, num_key_value_heads=32,
                 hidden_act="silu", max_position_embeddings=4096,
                 initializer_range=0.02, rms_norm_eps=1e-5, use_cache=True,
                 pad_token_id=None, bos_token_id=1, eos_token_id=2,
                 tie_word_embeddings=False, rope_theta=10000.0, rope_scaling=None,
                 attention_bias=False, attention_dropout=0.0, model_parallel_size=1,
                 swin_norm=False, vq_config=None, vocabulary_map=None,
                 mlp_bias=False, **kwargs):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.intermediate_size = intermediate_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.num_key_value_heads = num_key_value_heads
        self.hidden_act = hidden_act
        self.max_position_embeddings = max_position_embeddings
        self.initializer_range = initializer_range
        self.rms_norm_eps = rms_norm_eps
        self.use_cache = use_cache
        self.rope_theta = rope_theta
        self.rope_scaling = rope_scaling
        self.attention_bias = attention_bias
        self.attention_dropout = attention_dropout
        self.model_parallel_size = model_parallel_size
        self.swin_norm = swin_norm
        self.mlp_bias = mlp_bias
        if isinstance(vq_config, dict) or vq_config is None:
            vq_config = ChameleonVQVAEConfig(**(vq_config or {}))
        self.vq_config = vq_config
        self.vocabulary_map = vocabulary_map
        super().__init__(pad_token_id=pad_token_id, bos_token_id=bos_token_id,
                         eos_token_id=eos_token_id,
                         tie_word_embeddings=tie_word_embeddings, **kwargs)
