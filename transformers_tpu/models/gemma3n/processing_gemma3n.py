"""Gemma3n processor (reference models/gemma3n/processing_gemma3n.py):
Gemma3-style image expansion (fixed 256 soft tokens between boi/eoi) plus an
audio tier — each ``<audio_soft_token>`` placeholder expands to
``audio_seq_length`` copies between boa/eoa."""

from __future__ import annotations

from ...image_processing_utils import BatchFeature
from ..gemma3.processing_gemma3 import Gemma3Processor


class Gemma3nProcessor(Gemma3Processor):
    attributes = ["image_processor", "tokenizer", "feature_extractor"]

    def __init__(self, image_processor=None, tokenizer=None,
                 feature_extractor=None, audio_seq_length: int = 188,
                 boa_token: str = "<start_of_audio>",
                 eoa_token: str = "<end_of_audio>",
                 audio_token: str = "<audio_soft_token>", **kwargs):
        super().__init__(image_processor=image_processor, tokenizer=tokenizer,
                         **kwargs)
        self.feature_extractor = feature_extractor
        self.audio_seq_length = audio_seq_length
        self.boa_token = boa_token
        self.eoa_token = eoa_token
        self.audio_token = audio_token
        self.full_audio_sequence = (
            f"\n\n{boa_token}{audio_token * audio_seq_length}{eoa_token}\n\n")

    def __call__(self, text=None, images=None, audio=None, return_tensors="jax",
                 padding=True, **kwargs) -> BatchFeature:
        data: dict = {}
        if audio is not None and self.feature_extractor is not None:
            data.update(self.feature_extractor(audio, return_tensors=return_tensors))
            if text is not None:
                if isinstance(text, str):
                    text = [text]
                text = [t.replace(self.boa_token, self.full_audio_sequence)
                        for t in text]
        out = super().__call__(text=text, images=images,
                               return_tensors=return_tensors, padding=padding,
                               **kwargs)
        data.update(dict(out))
        return BatchFeature(data)
