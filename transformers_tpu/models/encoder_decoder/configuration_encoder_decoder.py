"""EncoderDecoder config (reference
src/transformers/models/encoder_decoder/configuration_encoder_decoder.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class EncoderDecoderConfig(PretrainedConfig):
    model_type = "encoder-decoder"
    sub_configs = {"encoder": "auto", "decoder": "auto"}

    def __init__(self, encoder=None, decoder=None, **kwargs):
        from ..auto.configuration_auto import AutoConfig

        if isinstance(encoder, dict):
            encoder = AutoConfig.for_model_type(
                encoder.get("model_type"),
                **{k: v for k, v in encoder.items() if k != "model_type"})
        if isinstance(decoder, dict):
            decoder = AutoConfig.for_model_type(
                decoder.get("model_type"),
                **{k: v for k, v in decoder.items() if k != "model_type"})
        self.encoder = encoder
        self.decoder = decoder
        kwargs.setdefault("is_encoder_decoder", True)
        super().__init__(**kwargs)

    @classmethod
    def from_encoder_decoder_configs(cls, encoder_config, decoder_config, **kwargs):
        decoder_config.is_decoder = True
        decoder_config.add_cross_attention = True
        return cls(encoder=encoder_config.to_dict(),
                   decoder=decoder_config.to_dict(), **kwargs)
