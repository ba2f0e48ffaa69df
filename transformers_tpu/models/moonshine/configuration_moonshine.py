"""Moonshine config (reference models/moonshine/configuration_moonshine.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class MoonshineConfig(PretrainedConfig):
    model_type = "moonshine"

    def __init__(self, vocab_size=32768, hidden_size=288, intermediate_size=1152,
                 encoder_num_hidden_layers=6, decoder_num_hidden_layers=6,
                 encoder_num_attention_heads=8, decoder_num_attention_heads=8,
                 encoder_num_key_value_heads=None, decoder_num_key_value_heads=None,
                 pad_head_dim_to_multiple_of=None, encoder_hidden_act="gelu",
                 decoder_hidden_act="silu", max_position_embeddings=512,
                 initializer_range=0.02, decoder_start_token_id=1, use_cache=True,
                 rope_theta=10000.0, rope_scaling=None, partial_rotary_factor=0.9,
                 is_encoder_decoder=True, attention_bias=False,
                 attention_dropout=0.0, bos_token_id=1, eos_token_id=2, **kwargs):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.intermediate_size = intermediate_size
        self.encoder_num_hidden_layers = encoder_num_hidden_layers
        self.decoder_num_hidden_layers = decoder_num_hidden_layers
        self.encoder_num_attention_heads = encoder_num_attention_heads
        self.decoder_num_attention_heads = decoder_num_attention_heads
        self.encoder_num_key_value_heads = (encoder_num_key_value_heads
                                            or encoder_num_attention_heads)
        self.decoder_num_key_value_heads = (decoder_num_key_value_heads
                                            or decoder_num_attention_heads)
        self.pad_head_dim_to_multiple_of = pad_head_dim_to_multiple_of
        self.encoder_hidden_act = encoder_hidden_act
        self.decoder_hidden_act = decoder_hidden_act
        self.max_position_embeddings = max_position_embeddings
        self.initializer_range = initializer_range
        self.use_cache = use_cache
        self.rope_theta = rope_theta
        self.rope_scaling = rope_scaling
        self.partial_rotary_factor = partial_rotary_factor
        self.attention_bias = attention_bias
        self.attention_dropout = attention_dropout
        super().__init__(bos_token_id=bos_token_id, eos_token_id=eos_token_id,
                         is_encoder_decoder=is_encoder_decoder,
                         decoder_start_token_id=decoder_start_token_id, **kwargs)
