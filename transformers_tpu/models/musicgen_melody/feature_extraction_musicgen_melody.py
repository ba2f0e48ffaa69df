"""Musicgen-Melody feature extractor (reference
models/musicgen_melody/feature_extraction_musicgen_melody.py): chroma
spectrogram — normalized hann STFT (n_fft 16384, hop 4096) folded onto 12
pitch classes, inf-norm normalized, then one-hot argmax per frame. Demucs
stem extraction is out of scope (raw audio path only)."""

from __future__ import annotations

import numpy as np

from ...audio_utils import chroma_filter_bank, stft_magnitudes, window_function
from ...feature_extraction_utils import BatchFeature, SequenceFeatureExtractor


class MusicgenMelodyFeatureExtractor(SequenceFeatureExtractor):
    model_input_names = ["input_features"]

    def __init__(self, feature_size=12, sampling_rate=32000, hop_length=4096,
                 chunk_length=30, n_fft=16384, num_chroma=12,
                 padding_value=0.0, stem_indices=(3, 2), **kwargs):
        super().__init__(feature_size=feature_size, sampling_rate=sampling_rate,
                         padding_value=padding_value, **kwargs)
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.chunk_length = chunk_length
        self.num_chroma = num_chroma
        self.stem_indices = list(stem_indices)
        self._chroma = chroma_filter_bank(
            num_frequency_bins=n_fft, num_chroma=num_chroma,
            sampling_rate=sampling_rate, tuning=0)  # [num_chroma, n_fft//2+1]
        # torchaudio Spectrogram(normalized=True): window-L2-normalized STFT
        self._window = window_function(n_fft, "hann", periodic=True)

    def _extract_chroma_features(self, waveform: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp

        wav = np.asarray(waveform, np.float32)
        if wav.shape[-1] < self.n_fft:
            pad = self.n_fft - wav.shape[-1]
            wav = np.pad(wav, (pad // 2, pad - pad // 2))
        spec = np.asarray(stft_magnitudes(
            jnp.asarray(wav), n_fft=self.n_fft, hop_length=self.hop_length,
            window=self._window, center=True, power=2.0))
        spec = spec / (self._window.astype(np.float64) ** 2).sum()
        raw = self._chroma @ spec  # [num_chroma, T]
        norm = raw / np.maximum(np.abs(raw).max(axis=0, keepdims=True), 1e-6)
        chroma = norm.T  # [T, num_chroma]
        onehot = np.zeros_like(chroma)
        onehot[np.arange(chroma.shape[0]), chroma.argmax(-1)] = 1.0
        return onehot.astype(np.float32)

    def __call__(self, audio, padding=True, max_length=None,
                 return_tensors="np", sampling_rate=None, **kwargs) -> BatchFeature:
        if sampling_rate is not None and sampling_rate != self.sampling_rate:
            raise ValueError(
                f"Model expects {self.sampling_rate} Hz input, got {sampling_rate}")
        if isinstance(audio, np.ndarray) and audio.ndim == 1:
            audio = [audio]
        feats = [self._extract_chroma_features(a) for a in audio]
        t = max(f.shape[0] for f in feats)
        out = np.zeros((len(feats), t, self.num_chroma), np.float32)
        for i, f in enumerate(feats):
            out[i, :f.shape[0]] = f
        data = {"input_features": out}
        if return_tensors == "jax":
            import jax.numpy as jnp

            data = {k: jnp.asarray(v) for k, v in data.items()}
        return BatchFeature(data)
