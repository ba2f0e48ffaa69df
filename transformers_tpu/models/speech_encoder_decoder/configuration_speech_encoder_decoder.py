"""SpeechEncoderDecoder config (reference
src/transformers/models/speech_encoder_decoder/configuration_speech_encoder_decoder.py)."""

from __future__ import annotations

from ..encoder_decoder.configuration_encoder_decoder import EncoderDecoderConfig


class SpeechEncoderDecoderConfig(EncoderDecoderConfig):
    model_type = "speech-encoder-decoder"
