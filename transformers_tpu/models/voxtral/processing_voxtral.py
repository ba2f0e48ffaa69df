"""Voxtral processor (reference models/voxtral/processing_voxtral.py):
Whisper feature extractor with mel features split into chunks of
``max_source_positions`` frames stacked along batch; tokenizer for text.
The chat-template audio expansion is carried by apply_transcription_request
(audio token id 24, one per encoder output position)."""

from __future__ import annotations

import numpy as np

from ...image_processing_utils import BatchFeature
from ...processing_utils import ProcessorMixin


class VoxtralProcessor(ProcessorMixin):
    attributes = ["feature_extractor", "tokenizer"]

    def __init__(self, feature_extractor=None, tokenizer=None,
                 max_source_positions: int = 3000, **kwargs):
        super().__init__(feature_extractor=feature_extractor, tokenizer=tokenizer,
                         **kwargs)
        self.max_source_positions = max_source_positions

    def _chunked_features(self, audio, **kwargs):
        out = self.feature_extractor(audio, return_tensors="np", **kwargs)
        feats = np.asarray(out["input_features"])  # [B, n_mels, T]
        chunks = []
        for f in feats:
            t = f.shape[-1]
            for st in range(0, t, self.max_source_positions):
                chunk = f[:, st:st + self.max_source_positions]
                if chunk.shape[-1] < self.max_source_positions:
                    chunk = np.pad(chunk, ((0, 0), (0, self.max_source_positions
                                                    - chunk.shape[-1])))
                chunks.append(chunk)
        return np.stack(chunks)

    def __call__(self, text=None, audio=None, return_tensors="np",
                 padding=True, **kwargs) -> BatchFeature:
        data: dict = {}
        if audio is not None:
            data["input_features"] = self._chunked_features(audio, **kwargs)
        if text is not None:
            if isinstance(text, str):
                text = [text]
            data.update(self.tokenizer(text, return_tensors=return_tensors,
                                       padding=padding))
        return BatchFeature(data)
