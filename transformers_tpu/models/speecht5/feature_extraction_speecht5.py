"""SpeechT5 feature extractor (reference
models/speecht5/feature_extraction_speecht5.py): raw waveform input path
(optional zero-mean/unit-var) and log10-mel target path (80 slaney mels,
hann 64ms/16ms) emitted as ``input_values`` either way — audio targets come
through ``audio_target=``."""

from __future__ import annotations

import numpy as np

from ...audio_utils import mel_filter_bank, stft_magnitudes, window_function
from ...feature_extraction_utils import BatchFeature, SequenceFeatureExtractor


def _optimal_fft_length(n: int) -> int:
    out = 1
    while out < n:
        out *= 2
    return out


class SpeechT5FeatureExtractor(SequenceFeatureExtractor):
    model_input_names = ["input_values", "attention_mask"]

    def __init__(self, feature_size=1, sampling_rate=16000, padding_value=0.0,
                 do_normalize=False, num_mel_bins=80, hop_length=16,
                 win_length=64, win_function="hann_window", frame_signal_scale=1.0,
                 fmin=80, fmax=7600, mel_floor=1e-10, reduction_factor=2,
                 return_attention_mask=True, **kwargs):
        super().__init__(feature_size=feature_size, sampling_rate=sampling_rate,
                         padding_value=padding_value, **kwargs)
        self.do_normalize = do_normalize
        self.num_mel_bins = num_mel_bins
        self.hop_length = hop_length
        self.win_length = win_length
        self.fmin = fmin
        self.fmax = fmax
        self.mel_floor = mel_floor
        self.reduction_factor = reduction_factor
        self.return_attention_mask = return_attention_mask
        self.sample_size = win_length * sampling_rate // 1000
        self.sample_stride = hop_length * sampling_rate // 1000
        self.n_fft = _optimal_fft_length(self.sample_size)
        self._window = window_function(self.sample_size, "hann", periodic=True)
        self._mel_filters = mel_filter_bank(
            num_frequency_bins=(self.n_fft // 2) + 1,
            num_mel_filters=num_mel_bins, min_frequency=fmin,
            max_frequency=fmax, sampling_rate=sampling_rate, norm="slaney",
            mel_scale="slaney")

    def _extract_mel_features(self, waveform: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp

        # |STFT| (power 1) at centered hann frames, then slaney mels + log10
        mag = np.asarray(stft_magnitudes(
            jnp.asarray(np.asarray(waveform, np.float32)),
            n_fft=self.n_fft, hop_length=self.sample_stride,
            window=np.pad(self._window, (0, self.n_fft - self.sample_size)),
            center=True, power=1.0))  # [n_freqs, n_frames]
        mel = np.maximum(self._mel_filters.T @ mag, self.mel_floor)
        return np.log10(mel).T.astype(np.float32)  # [n_frames, n_mels]

    def __call__(self, audio=None, audio_target=None, padding=True,
                 max_length=None, return_tensors="np", sampling_rate=None,
                 **kwargs) -> BatchFeature:
        if sampling_rate is not None and sampling_rate != self.sampling_rate:
            raise ValueError(
                f"Model expects {self.sampling_rate} Hz input, got {sampling_rate}")
        if audio is None and audio_target is None:
            raise ValueError("Pass audio and/or audio_target.")
        data: dict = {}
        if audio is not None:
            if isinstance(audio, np.ndarray) and audio.ndim == 1:
                audio = [audio]
            seqs = [np.asarray(s, np.float32) for s in audio]
            if self.do_normalize:
                seqs = [(s - s.mean()) / np.sqrt(s.var() + 1e-7) for s in seqs]
            lengths = [len(s) for s in seqs]
            target = max_length or max(lengths)
            vals = np.stack([np.pad(s, (0, target - len(s)))[:target] for s in seqs])
            data["input_values"] = vals
            data["attention_mask"] = np.stack(
                [(np.arange(target) < n).astype(np.int64) for n in lengths])
        if audio_target is not None:
            if isinstance(audio_target, np.ndarray) and audio_target.ndim == 1:
                audio_target = [audio_target]
            mels = [self._extract_mel_features(s) for s in audio_target]
            lengths = [m.shape[0] for m in mels]
            tgt = max(lengths)
            out = np.zeros((len(mels), tgt, self.num_mel_bins), np.float32)
            for i, m in enumerate(mels):
                out[i, :m.shape[0]] = m
            key = "labels" if audio is not None else "input_values"
            data[key] = out
            if audio is None:
                data["attention_mask"] = np.stack(
                    [(np.arange(tgt) < n).astype(np.int64) for n in lengths])
        if return_tensors == "jax":
            import jax.numpy as jnp

            data = {k: jnp.asarray(v) for k, v in data.items()}
        return BatchFeature(data)
