"""VisionEncoderDecoder config (reference
src/transformers/models/vision_encoder_decoder/configuration_vision_encoder_decoder.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class VisionEncoderDecoderConfig(PretrainedConfig):
    model_type = "vision-encoder-decoder"
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
