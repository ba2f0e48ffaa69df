"""Whisper feature extractor (reference
models/whisper/feature_extraction_whisper.py): pad/truncate to 30s, then
STFT -> |.|^2 -> mel matmul -> log10 -> clamp(max-8) -> (x+4)/4 — here as
jnp ops so the whole pipeline runs on device (:135-168 numerics)."""

from __future__ import annotations

import json
import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ...audio_utils import mel_filter_bank, stft_magnitudes, window_function
from ...image_processing_utils import BatchFeature
from ...utils.hub import cached_file

FEATURE_EXTRACTOR_NAME = "preprocessor_config.json"


class WhisperFeatureExtractor:
    model_input_names = ["input_features"]

    def __init__(
        self,
        feature_size=80,
        sampling_rate=16000,
        hop_length=160,
        chunk_length=30,
        n_fft=400,
        padding_value=0.0,
        **kwargs,
    ):
        self.feature_size = feature_size
        self.sampling_rate = sampling_rate
        self.hop_length = hop_length
        self.chunk_length = chunk_length
        self.n_fft = n_fft
        self.padding_value = padding_value
        self.n_samples = chunk_length * sampling_rate
        self.nb_max_frames = self.n_samples // hop_length
        self.mel_filters = mel_filter_bank(
            num_frequency_bins=1 + n_fft // 2,
            num_mel_filters=feature_size,
            min_frequency=0.0,
            max_frequency=8000.0,
            sampling_rate=sampling_rate,
            norm="slaney",
            mel_scale="slaney",
        )
        self.window = window_function(n_fft, "hann")

    @classmethod
    def from_pretrained(cls, pretrained_model_name_or_path, **kwargs) -> "WhisperFeatureExtractor":
        resolved = cached_file(str(pretrained_model_name_or_path), FEATURE_EXTRACTOR_NAME)
        with open(resolved, encoding="utf-8") as f:
            config = json.load(f)
        config.pop("mel_filters", None)
        config.pop("feature_extractor_type", None)
        config.pop("processor_class", None)
        config.update(kwargs)
        return cls(**config)

    def save_pretrained(self, save_directory) -> None:
        os.makedirs(save_directory, exist_ok=True)
        config = {
            "feature_extractor_type": "WhisperFeatureExtractor",
            "feature_size": self.feature_size,
            "sampling_rate": self.sampling_rate,
            "hop_length": self.hop_length,
            "chunk_length": self.chunk_length,
            "n_fft": self.n_fft,
            "padding_value": self.padding_value,
        }
        with open(os.path.join(save_directory, FEATURE_EXTRACTOR_NAME), "w", encoding="utf-8") as f:
            json.dump(config, f, indent=2, sort_keys=True)

    def extract_fbank(self, waveform: jnp.ndarray) -> jnp.ndarray:
        """[B, n_samples] -> [B, n_mels, n_frames] log-mel (reference
        _torch_extract_fbank_features numerics, including the dropped last
        frame and per-example max-8 clamp)."""
        mags = stft_magnitudes(waveform, n_fft=self.n_fft, hop_length=self.hop_length,
                               window=self.window, center=True, power=2.0)
        mags = mags[..., :-1]  # torch.stft produces one extra frame; reference drops it
        mel = jnp.einsum("fm,...ft->...mt", jnp.asarray(self.mel_filters), mags)
        log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
        max_val = jnp.max(log_spec, axis=(-2, -1), keepdims=True)
        log_spec = jnp.maximum(log_spec, max_val - 8.0)
        return (log_spec + 4.0) / 4.0

    def __call__(self, raw_speech, sampling_rate: Optional[int] = None,
                 return_tensors: Optional[str] = "jax", padding="max_length",
                 **kwargs) -> BatchFeature:
        if sampling_rate is not None and sampling_rate != self.sampling_rate:
            raise ValueError(f"Expected sampling_rate={self.sampling_rate}, got {sampling_rate}")
        if isinstance(raw_speech, np.ndarray) and raw_speech.ndim == 1:
            raw_speech = [raw_speech]
        elif isinstance(raw_speech, (list, tuple)) and raw_speech and np.isscalar(raw_speech[0]):
            raw_speech = [np.asarray(raw_speech)]
        batch = np.full((len(raw_speech), self.n_samples), self.padding_value, np.float32)
        for i, speech in enumerate(raw_speech):
            speech = np.asarray(speech, np.float32)[: self.n_samples]
            batch[i, : len(speech)] = speech
        features = self.extract_fbank(jnp.asarray(batch))
        if return_tensors in ("np", "numpy"):
            features = np.asarray(features)
        return BatchFeature({"input_features": features})
