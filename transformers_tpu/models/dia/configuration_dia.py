"""Dia (Nari Labs) configs (reference models/dia/configuration_dia.py): byte
text encoder + multi-channel audio-codebook decoder TTS."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


def _theta(rope_parameters, default=10000.0):
    if isinstance(rope_parameters, dict):
        return rope_parameters.get("rope_theta", default)
    return default


class DiaEncoderConfig(PretrainedConfig):
    model_type = "dia_encoder"

    def __init__(self, max_position_embeddings=1024, num_hidden_layers=12,
                 hidden_size=1024, num_attention_heads=16,
                 num_key_value_heads=16, head_dim=128, intermediate_size=4096,
                 norm_eps=1e-5, vocab_size=256, hidden_act="silu",
                 rope_parameters=None, initializer_range=0.02, **kwargs):
        self.max_position_embeddings = max_position_embeddings
        self.num_hidden_layers = num_hidden_layers
        self.hidden_size = hidden_size
        self.num_attention_heads = num_attention_heads
        self.num_key_value_heads = num_key_value_heads or num_attention_heads
        self.head_dim = head_dim
        self.intermediate_size = intermediate_size
        self.norm_eps = norm_eps
        self.rms_norm_eps = norm_eps
        self.vocab_size = vocab_size
        self.hidden_act = hidden_act
        self.rope_theta = _theta(rope_parameters)
        self.initializer_range = initializer_range
        super().__init__(**kwargs)


class DiaDecoderConfig(PretrainedConfig):
    model_type = "dia_decoder"

    def __init__(self, max_position_embeddings=3072, num_hidden_layers=18,
                 hidden_size=2048, intermediate_size=8192,
                 num_attention_heads=16, num_key_value_heads=4, head_dim=128,
                 cross_num_attention_heads=16, cross_head_dim=128,
                 cross_num_key_value_heads=16, cross_hidden_size=1024,
                 norm_eps=1e-5, vocab_size=1028, hidden_act="silu",
                 num_channels=9, rope_parameters=None, initializer_range=0.02,
                 use_cache=True, is_encoder_decoder=True, pad_token_id=1025,
                 eos_token_id=1024, bos_token_id=1026, **kwargs):
        self.max_position_embeddings = max_position_embeddings
        self.num_hidden_layers = num_hidden_layers
        self.hidden_size = hidden_size
        self.intermediate_size = intermediate_size
        self.num_attention_heads = num_attention_heads
        self.num_key_value_heads = num_key_value_heads or num_attention_heads
        self.head_dim = head_dim
        self.cross_num_attention_heads = cross_num_attention_heads
        self.cross_head_dim = cross_head_dim
        self.cross_num_key_value_heads = cross_num_key_value_heads
        self.cross_hidden_size = cross_hidden_size
        self.norm_eps = norm_eps
        self.rms_norm_eps = norm_eps
        self.vocab_size = vocab_size
        self.hidden_act = hidden_act
        self.num_channels = num_channels
        self.rope_theta = _theta(rope_parameters)
        self.initializer_range = initializer_range
        self.use_cache = use_cache
        super().__init__(is_encoder_decoder=is_encoder_decoder,
                         pad_token_id=pad_token_id, eos_token_id=eos_token_id,
                         bos_token_id=bos_token_id, **kwargs)


class DiaConfig(PretrainedConfig):
    model_type = "dia"
    sub_configs = {"encoder_config": DiaEncoderConfig,
                   "decoder_config": DiaDecoderConfig}

    def __init__(self, encoder_config=None, decoder_config=None, norm_eps=1e-5,
                 is_encoder_decoder=True, pad_token_id=None, eos_token_id=None,
                 bos_token_id=None, delay_pattern=None, initializer_range=0.02,
                 use_cache=True, **kwargs):
        if isinstance(encoder_config, dict):
            encoder_config = DiaEncoderConfig(**encoder_config)
        elif encoder_config is None:
            encoder_config = DiaEncoderConfig()
        if isinstance(decoder_config, dict):
            decoder_config = DiaDecoderConfig(**decoder_config)
        elif decoder_config is None:
            decoder_config = DiaDecoderConfig()
        self.encoder_config = encoder_config
        self.decoder_config = decoder_config
        self.norm_eps = norm_eps
        self.delay_pattern = (delay_pattern if delay_pattern is not None
                              else [0, 8, 9, 10, 11, 12, 13, 14, 15][:decoder_config.num_channels])
        self.initializer_range = initializer_range
        self.use_cache = use_cache
        super().__init__(
            is_encoder_decoder=is_encoder_decoder,
            pad_token_id=pad_token_id if pad_token_id is not None
            else decoder_config.pad_token_id,
            eos_token_id=eos_token_id if eos_token_id is not None
            else decoder_config.eos_token_id,
            bos_token_id=bos_token_id if bos_token_id is not None
            else decoder_config.bos_token_id, **kwargs)
