"""MusicGen config (reference src/transformers/models/musicgen/configuration_musicgen.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class MusicgenDecoderConfig(PretrainedConfig):
    model_type = "musicgen_decoder"

    def __init__(self, vocab_size=2048, max_position_embeddings=2048,
                 num_hidden_layers=24, ffn_dim=4096, num_attention_heads=16,
                 layerdrop=0.0, use_cache=True, activation_function="gelu",
                 hidden_size=1024, dropout=0.1, attention_dropout=0.0,
                 activation_dropout=0.0, initializer_factor=0.02,
                 scale_embedding=False, num_codebooks=4, audio_channels=1,
                 pad_token_id=2048, bos_token_id=2048, eos_token_id=None, **kwargs):
        self.vocab_size = vocab_size
        self.max_position_embeddings = max_position_embeddings
        self.num_hidden_layers = num_hidden_layers
        self.ffn_dim = ffn_dim
        self.num_attention_heads = num_attention_heads
        self.layerdrop = layerdrop
        self.use_cache = use_cache
        self.activation_function = activation_function
        self.hidden_size = hidden_size
        self.dropout = dropout
        self.attention_dropout = attention_dropout
        self.activation_dropout = activation_dropout
        self.initializer_factor = initializer_factor
        self.scale_embedding = scale_embedding
        self.num_codebooks = num_codebooks
        self.audio_channels = audio_channels
        super().__init__(pad_token_id=pad_token_id, bos_token_id=bos_token_id,
                         eos_token_id=eos_token_id, **kwargs)


class MusicgenConfig(PretrainedConfig):
    model_type = "musicgen"
    sub_configs = {"text_encoder": "auto", "audio_encoder": "auto",
                   "decoder": MusicgenDecoderConfig}

    def __init__(self, text_encoder=None, audio_encoder=None, decoder=None, **kwargs):
        from ..auto.configuration_auto import AutoConfig

        if isinstance(text_encoder, dict):
            text_encoder = AutoConfig.for_model_type(
                text_encoder.get("model_type", "t5"),
                **{k: v for k, v in text_encoder.items() if k != "model_type"})
        if isinstance(audio_encoder, dict):
            audio_encoder = AutoConfig.for_model_type(
                audio_encoder.get("model_type", "encodec"),
                **{k: v for k, v in audio_encoder.items() if k != "model_type"})
        if isinstance(decoder, dict):
            decoder = MusicgenDecoderConfig(
                **{k: v for k, v in decoder.items() if k != "model_type"})
        self.text_encoder = text_encoder
        self.audio_encoder = audio_encoder
        self.decoder = decoder
        self.is_encoder_decoder = True
        super().__init__(**kwargs)
