"""Bark processor (reference models/bark/processing_bark.py): BERT tokenizer
at max_length 256 + optional voice-preset dict of semantic/coarse/fine
prompts."""

from __future__ import annotations

import numpy as np

from ...image_processing_utils import BatchFeature
from ...processing_utils import ProcessorMixin

PRESET_KEYS = ["semantic_prompt", "coarse_prompt", "fine_prompt"]


class BarkProcessor(ProcessorMixin):
    attributes = ["tokenizer"]

    def __call__(self, text=None, voice_preset=None, return_tensors="np",
                 max_length=256, **kwargs) -> BatchFeature:
        data: dict = {}
        if text is not None:
            data.update(self.tokenizer(
                text if not isinstance(text, str) else [text],
                return_tensors=return_tensors, padding="max_length",
                max_length=max_length, truncation=True,
                add_special_tokens=False))
        if voice_preset is not None:
            if isinstance(voice_preset, str):
                voice_preset = dict(np.load(voice_preset))
            missing = [k for k in PRESET_KEYS if k not in voice_preset]
            if missing:
                raise ValueError(f"voice_preset missing keys {missing}")
            data["history_prompt"] = {k: np.asarray(voice_preset[k])
                                      for k in PRESET_KEYS}
        return BatchFeature(data)
