"""CLAP feature extractor (reference
src/transformers/models/clap/feature_extraction_clap.py), non-fusion path:
log-mel (dB) spectrogram with the slaney filter bank, ``repeatpad`` padding,
center crop for long audio (the reference random-crops at train time).
"""

from __future__ import annotations

import numpy as np

from ...audio_utils import mel_filter_bank, stft_magnitudes, window_function
from ...feature_extraction_utils import BatchFeature, SequenceFeatureExtractor


class ClapFeatureExtractor(SequenceFeatureExtractor):
    model_input_names = ["input_features", "is_longer"]

    def __init__(self, feature_size=64, sampling_rate=48_000, hop_length=480,
                 max_length_s=10, fft_window_size=1024, padding_value=0.0,
                 return_attention_mask=False, frequency_min=0, frequency_max=14_000,
                 top_db=None, truncation="fusion", padding="repeatpad", **kwargs):
        super().__init__(feature_size=feature_size, sampling_rate=sampling_rate,
                         padding_value=padding_value,
                         return_attention_mask=return_attention_mask, **kwargs)
        self.top_db = top_db
        self.truncation = truncation
        self.padding = padding
        self.fft_window_size = fft_window_size
        self.nb_frequency_bins = (fft_window_size >> 1) + 1
        self.hop_length = hop_length
        self.max_length_s = max_length_s
        self.nb_max_samples = max_length_s * sampling_rate
        self.frequency_min = frequency_min
        self.frequency_max = frequency_max

    def _mel_filters(self, slaney: bool) -> np.ndarray:
        if slaney:
            return mel_filter_bank(num_frequency_bins=self.nb_frequency_bins,
                                   num_mel_filters=self.feature_size,
                                   min_frequency=self.frequency_min,
                                   max_frequency=self.frequency_max,
                                   sampling_rate=self.sampling_rate,
                                   norm="slaney", mel_scale="slaney")
        return mel_filter_bank(num_frequency_bins=self.nb_frequency_bins,
                               num_mel_filters=self.feature_size,
                               min_frequency=self.frequency_min,
                               max_frequency=self.frequency_max,
                               sampling_rate=self.sampling_rate,
                               norm=None, mel_scale="htk")

    def _log_mel(self, waveform: np.ndarray, slaney: bool) -> np.ndarray:
        # host-side float64 numpy for bit-parity with the reference's numpy
        # spectrogram (the on-device jnp path in audio_utils is float32)
        n_fft, hop = self.fft_window_size, self.hop_length
        w = np.pad(waveform.astype(np.float64), (n_fft // 2, n_fft // 2), mode="reflect")
        n_frames = 1 + (len(w) - n_fft) // hop
        idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
        frames = w[idx] * window_function(n_fft, "hann")
        spec = np.abs(np.fft.rfft(frames, axis=-1)) ** 2  # [frames, freqs]
        mel = spec @ self._mel_filters(slaney)
        log_mel = 10.0 * np.log10(np.maximum(mel, 1e-10))
        return log_mel.astype(np.float32)  # [frames, mel]

    def _one(self, waveform: np.ndarray, truncation: str, padding: str):
        max_length = self.nb_max_samples
        longer = False
        if waveform.shape[0] > max_length:
            longer = truncation != "fusion"
            # deterministic center crop (the reference random-crops)
            start = (waveform.shape[0] - max_length) // 2
            waveform = waveform[start : start + max_length]
        elif waveform.shape[0] < max_length:
            if padding == "repeat":
                n = int(max_length / len(waveform))
                waveform = np.tile(waveform, n + 1)[:max_length]
            elif padding == "repeatpad":
                n = int(max_length / len(waveform))
                waveform = np.tile(waveform, n)
            waveform = np.pad(waveform, (0, max_length - waveform.shape[0]))
        mel = self._log_mel(waveform, slaney=truncation != "fusion")
        if truncation == "fusion":
            return np.stack([mel] * 4, axis=0), longer
        return mel[None], longer

    def __call__(self, raw_speech, truncation=None, padding=None, sampling_rate=None,
                 return_tensors=None, **kwargs) -> BatchFeature:
        truncation = truncation or self.truncation
        padding = padding or self.padding
        if isinstance(raw_speech, np.ndarray) and raw_speech.ndim == 1:
            raw_speech = [raw_speech]
        elif isinstance(raw_speech, (list, tuple)) and np.isscalar(raw_speech[0]):
            raw_speech = [np.asarray(raw_speech, np.float64)]
        mels, longer = [], []
        for w in raw_speech:
            m, lg = self._one(np.asarray(w, np.float64), truncation, padding)
            mels.append(m)
            longer.append([lg])
        feats = np.stack(mels).astype(np.float32)
        out = {"input_features": feats, "is_longer": np.asarray(longer)}
        if return_tensors == "jax":
            import jax.numpy as jnp

            out = {k: jnp.asarray(v) for k, v in out.items()}
        return BatchFeature(out)
