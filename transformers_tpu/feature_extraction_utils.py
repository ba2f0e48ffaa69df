"""Sequence feature extraction base.

TPU-native analog of reference src/transformers/feature_extraction_utils.py +
feature_extraction_sequence_utils.py (``SequenceFeatureExtractor``): padding
and batching for raw float sequences (audio), hub config round-trip.
``BatchFeature`` lives in image_processing_utils and is shared.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional, Union

import numpy as np

from .image_processing_utils import BatchFeature
from .utils.hub import FEATURE_EXTRACTOR_NAME, cached_file


class SequenceFeatureExtractor:
    """Pad/truncate variable-length float sequences (reference
    feature_extraction_sequence_utils.py)."""

    model_input_names = ["input_values"]

    def __init__(self, feature_size: int = 1, sampling_rate: int = 16000,
                 padding_value: float = 0.0, **kwargs):
        self.feature_size = feature_size
        self.sampling_rate = sampling_rate
        self.padding_value = padding_value
        for k, v in kwargs.items():
            if not k.startswith("_"):
                setattr(self, k, v)

    @classmethod
    def from_pretrained(cls, pretrained_model_name_or_path, **kwargs):
        resolved = cached_file(str(pretrained_model_name_or_path), FEATURE_EXTRACTOR_NAME)
        with open(resolved, encoding="utf-8") as f:
            config = json.load(f)
        config.pop("feature_extractor_type", None)
        config.update(kwargs)
        return cls(**config)

    def save_pretrained(self, save_directory) -> None:
        os.makedirs(save_directory, exist_ok=True)
        config = {k: v for k, v in self.__dict__.items()
                  if isinstance(v, (int, float, str, bool, list, dict, type(None)))}
        config["feature_extractor_type"] = type(self).__name__
        with open(os.path.join(save_directory, FEATURE_EXTRACTOR_NAME), "w", encoding="utf-8") as f:
            json.dump(config, f, indent=2, sort_keys=True)

    def pad(
        self,
        features: Union[list, dict],
        padding: Union[bool, str] = True,
        max_length: Optional[int] = None,
        pad_to_multiple_of: Optional[int] = None,
        return_attention_mask: bool = True,
        return_tensors: Optional[str] = "np",
    ) -> BatchFeature:
        name = self.model_input_names[0]
        if isinstance(features, dict):
            seqs = [np.asarray(s, np.float32) for s in features[name]]
        else:
            seqs = [np.asarray(f[name] if isinstance(f, dict) else f, np.float32) for f in features]
        target = max(len(s) for s in seqs)
        if padding == "max_length" and max_length:
            target = max_length
        if pad_to_multiple_of:
            target = -(-target // pad_to_multiple_of) * pad_to_multiple_of
        shape_tail = seqs[0].shape[1:]
        batch = np.full((len(seqs), target, *shape_tail), self.padding_value, np.float32)
        mask = np.zeros((len(seqs), target), np.int32)
        for i, s in enumerate(seqs):
            n = min(len(s), target)
            batch[i, :n] = s[:n]
            mask[i, :n] = 1
        data: dict[str, Any] = {name: batch}
        if return_attention_mask:
            data["attention_mask"] = mask
        if return_tensors == "jax":
            import jax.numpy as jnp

            data = {k: jnp.asarray(v) for k, v in data.items()}
        return BatchFeature(data)

    def __call__(self, raw_speech, sampling_rate: Optional[int] = None, **kwargs) -> BatchFeature:
        if sampling_rate is not None and sampling_rate != self.sampling_rate:
            raise ValueError(f"Expected sampling_rate={self.sampling_rate}, got {sampling_rate}")
        if isinstance(raw_speech, np.ndarray) and raw_speech.ndim == 1:
            raw_speech = [raw_speech]
        return self.pad(
            [{self.model_input_names[0]: s} for s in raw_speech], **kwargs)


class AutoFeatureExtractor:
    """Type-dispatching loader (reference models/auto/feature_extraction_auto.py):
    resolves ``feature_extractor_type`` from preprocessor_config.json."""

    @classmethod
    def from_pretrained(cls, pretrained_model_name_or_path, **kwargs):
        resolved = cached_file(str(pretrained_model_name_or_path), FEATURE_EXTRACTOR_NAME)
        with open(resolved, encoding="utf-8") as f:
            type_name = json.load(f).get("feature_extractor_type", "")
        if "Whisper" in type_name or type_name.startswith(("Qwen2Audio", "Voxtral")):
            from .models.whisper import WhisperFeatureExtractor

            return WhisperFeatureExtractor.from_pretrained(pretrained_model_name_or_path, **kwargs)
        if "Clap" in type_name:
            from .models.clap import ClapFeatureExtractor

            return ClapFeatureExtractor.from_pretrained(pretrained_model_name_or_path, **kwargs)
        if "Seamless" in type_name or "Wav2Vec2Bert" in type_name:
            from .models.seamless_m4t import SeamlessM4TFeatureExtractor

            return SeamlessM4TFeatureExtractor.from_pretrained(pretrained_model_name_or_path, **kwargs)
        if "Speech2Text" in type_name:
            from .models.speech_to_text import Speech2TextFeatureExtractor

            return Speech2TextFeatureExtractor.from_pretrained(pretrained_model_name_or_path, **kwargs)
        if "SpeechT5" in type_name:
            from .models.speecht5 import SpeechT5FeatureExtractor

            return SpeechT5FeatureExtractor.from_pretrained(pretrained_model_name_or_path, **kwargs)
        if "Encodec" in type_name or "MusicgenMelody" not in type_name and "Musicgen" in type_name:
            from .models.encodec import EncodecFeatureExtractor

            return EncodecFeatureExtractor.from_pretrained(pretrained_model_name_or_path, **kwargs)
        if "MusicgenMelody" in type_name:
            from .models.musicgen_melody import MusicgenMelodyFeatureExtractor

            return MusicgenMelodyFeatureExtractor.from_pretrained(pretrained_model_name_or_path, **kwargs)
        if "Parakeet" in type_name:
            from .models.parakeet import ParakeetFeatureExtractor

            return ParakeetFeatureExtractor.from_pretrained(pretrained_model_name_or_path, **kwargs)
        if "Wav2Vec2" in type_name:
            from .models.wav2vec2 import Wav2Vec2FeatureExtractor

            return Wav2Vec2FeatureExtractor.from_pretrained(pretrained_model_name_or_path, **kwargs)
        return SequenceFeatureExtractor.from_pretrained(pretrained_model_name_or_path, **kwargs)
