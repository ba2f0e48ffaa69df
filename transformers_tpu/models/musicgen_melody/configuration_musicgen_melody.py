"""MusicGen Melody config (reference
src/transformers/models/musicgen_melody/configuration_musicgen_melody.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig
from ..musicgen.configuration_musicgen import MusicgenDecoderConfig


class MusicgenMelodyDecoderConfig(MusicgenDecoderConfig):
    model_type = "musicgen_melody_decoder"


class MusicgenMelodyConfig(PretrainedConfig):
    model_type = "musicgen_melody"
    sub_configs = {"text_encoder": "auto", "audio_encoder": "auto",
                   "decoder": MusicgenMelodyDecoderConfig}

    def __init__(self, num_chroma=12, chroma_length=235, text_encoder=None,
                 audio_encoder=None, decoder=None, **kwargs):
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
            decoder = MusicgenMelodyDecoderConfig(
                **{k: v for k, v in decoder.items() if k != "model_type"})
        self.num_chroma = num_chroma
        self.chroma_length = chroma_length
        self.text_encoder = text_encoder
        self.audio_encoder = audio_encoder
        self.decoder = decoder
        super().__init__(**kwargs)
