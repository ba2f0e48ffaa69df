"""Parakeet configs (reference src/transformers/models/parakeet/configuration_parakeet.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class ParakeetEncoderConfig(PretrainedConfig):
    model_type = "parakeet_encoder"

    def __init__(self, hidden_size=1024, num_hidden_layers=24, num_attention_heads=8,
                 num_key_value_heads=None, intermediate_size=4096, hidden_act="silu",
                 attention_bias=True, convolution_bias=True, conv_kernel_size=9,
                 subsampling_factor=8, subsampling_conv_channels=256, num_mel_bins=80,
                 subsampling_conv_kernel_size=3, subsampling_conv_stride=2,
                 dropout=0.1, dropout_positions=0.0, layerdrop=0.1,
                 activation_dropout=0.1, attention_dropout=0.1,
                 max_position_embeddings=5000, scale_input=True,
                 initializer_range=0.02, **kwargs):
        self.hidden_size = hidden_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.num_key_value_heads = (num_key_value_heads if num_key_value_heads
                                    is not None else num_attention_heads)
        self.intermediate_size = intermediate_size
        self.hidden_act = hidden_act
        self.attention_bias = attention_bias
        self.convolution_bias = convolution_bias
        self.conv_kernel_size = conv_kernel_size
        self.subsampling_factor = subsampling_factor
        self.subsampling_conv_channels = subsampling_conv_channels
        self.num_mel_bins = num_mel_bins
        self.subsampling_conv_kernel_size = subsampling_conv_kernel_size
        self.subsampling_conv_stride = subsampling_conv_stride
        self.dropout = dropout
        self.dropout_positions = dropout_positions
        self.layerdrop = layerdrop
        self.activation_dropout = activation_dropout
        self.attention_dropout = attention_dropout
        self.max_position_embeddings = max_position_embeddings
        self.scale_input = scale_input
        self.initializer_range = initializer_range
        super().__init__(**kwargs)


class ParakeetCTCConfig(PretrainedConfig):
    model_type = "parakeet_ctc"
    sub_configs = {"encoder_config": ParakeetEncoderConfig}

    def __init__(self, encoder_config=None, vocab_size=1025,
                 ctc_loss_reduction="mean", ctc_zero_infinity=True,
                 pad_token_id=1024, **kwargs):
        if encoder_config is None:
            encoder_config = ParakeetEncoderConfig()
        elif isinstance(encoder_config, dict):
            encoder_config = ParakeetEncoderConfig(
                **{k: v for k, v in encoder_config.items() if k != "model_type"})
        self.encoder_config = encoder_config
        self.vocab_size = vocab_size
        self.ctc_loss_reduction = ctc_loss_reduction
        self.ctc_zero_infinity = ctc_zero_infinity
        super().__init__(pad_token_id=pad_token_id, **kwargs)


class ParakeetRNNTConfig(PretrainedConfig):
    model_type = "parakeet_rnnt"
    sub_configs = {"encoder_config": ParakeetEncoderConfig}

    def __init__(self, encoder_config=None, vocab_size=8193,
                 decoder_hidden_size=640, num_decoder_layers=2, hidden_act="relu",
                 max_symbols_per_step=10, pad_token_id=2, blank_token_id=8192,
                 is_encoder_decoder=True, **kwargs):
        if encoder_config is None:
            encoder_config = ParakeetEncoderConfig()
        elif isinstance(encoder_config, dict):
            encoder_config = ParakeetEncoderConfig(
                **{k: v for k, v in encoder_config.items() if k != "model_type"})
        self.encoder_config = encoder_config
        self.vocab_size = vocab_size
        self.decoder_hidden_size = decoder_hidden_size
        self.num_decoder_layers = num_decoder_layers
        self.hidden_act = hidden_act
        self.max_symbols_per_step = max_symbols_per_step
        self.blank_token_id = blank_token_id
        super().__init__(pad_token_id=pad_token_id,
                         is_encoder_decoder=is_encoder_decoder, **kwargs)


class ParakeetTDTConfig(ParakeetRNNTConfig):
    model_type = "parakeet_tdt"

    def __init__(self, durations=(0, 1, 2, 3, 4), **kwargs):
        self.durations = list(durations)
        super().__init__(**kwargs)
