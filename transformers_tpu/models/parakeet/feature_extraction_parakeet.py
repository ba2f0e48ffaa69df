"""Parakeet feature extractor (reference
models/parakeet/feature_extraction_parakeet.py): batch preemphasis over the
live region, centered constant-pad STFT (hann 400, fft 512, hop 160),
slaney log-mel with a 2^-24 zero guard, and per-feature mean/std
normalization over the live frames."""

from __future__ import annotations

import numpy as np

from ...audio_utils import mel_filter_bank, stft_magnitudes, window_function
from ...feature_extraction_utils import BatchFeature, SequenceFeatureExtractor

EPSILON = 1e-5
LOG_ZERO_GUARD_VALUE = 2 ** -24


class ParakeetFeatureExtractor(SequenceFeatureExtractor):
    model_input_names = ["input_features", "attention_mask"]

    def __init__(self, feature_size=80, sampling_rate=16000, hop_length=160,
                 n_fft=512, win_length=400, preemphasis=0.97,
                 padding_value=0.0, **kwargs):
        super().__init__(feature_size=feature_size, sampling_rate=sampling_rate,
                         padding_value=padding_value, **kwargs)
        self.hop_length = hop_length
        self.n_fft = n_fft
        self.win_length = win_length
        self.preemphasis = preemphasis
        self.return_attention_mask = True
        # librosa.filters.mel(norm="slaney", htk=False) == slaney/slaney
        self._mel_filters = mel_filter_bank(
            num_frequency_bins=n_fft // 2 + 1, num_mel_filters=feature_size,
            min_frequency=0.0, max_frequency=sampling_rate / 2,
            sampling_rate=sampling_rate, norm="slaney", mel_scale="slaney")
        self._window = np.pad(window_function(win_length, "hann", periodic=False),
                              ((n_fft - win_length) // 2,
                               n_fft - win_length - (n_fft - win_length) // 2))

    def __call__(self, raw_speech, padding=True, max_length=None,
                 return_tensors="np", sampling_rate=None, **kwargs) -> BatchFeature:
        import jax.numpy as jnp

        if sampling_rate is not None and sampling_rate != self.sampling_rate:
            raise ValueError(
                f"Model expects {self.sampling_rate} Hz input, got {sampling_rate}")
        if isinstance(raw_speech, np.ndarray) and raw_speech.ndim == 1:
            raw_speech = [raw_speech]
        seqs = [np.asarray(s, np.float32) for s in raw_speech]
        lengths = np.asarray([len(s) for s in seqs])
        target = max_length or int(lengths.max())
        wav = np.zeros((len(seqs), target), np.float32)
        for i, s in enumerate(seqs):
            wav[i, : min(len(s), target)] = s[:target]
        if self.preemphasis is not None:
            timemask = np.arange(target)[None, :] < lengths[:, None]
            wav = np.concatenate(
                [wav[:, :1], wav[:, 1:] - self.preemphasis * wav[:, :-1]], axis=1)
            wav = np.where(timemask, wav, 0.0)
        mag = np.asarray(stft_magnitudes(
            jnp.asarray(wav), n_fft=self.n_fft, hop_length=self.hop_length,
            window=self._window, center=True, power=2.0,
            pad_mode="constant"))  # [B, n_freqs, n_frames]
        mel = np.log(self._mel_filters.T[None] @ mag + LOG_ZERO_GUARD_VALUE)
        feats = mel.transpose(0, 2, 1)  # [B, n_frames, n_mels]
        feat_lengths = (lengths + (self.n_fft // 2) * 2 - self.n_fft) // self.hop_length
        mask = np.arange(feats.shape[1])[None, :] < feat_lengths[:, None]
        m = mask[..., None]
        masked = feats * m
        mean = masked.sum(1) / feat_lengths[:, None]
        var = (((masked - mean[:, None]) ** 2) * m).sum(1) / (feat_lengths - 1)[:, None]
        feats = (feats - mean[:, None]) / (np.sqrt(var)[:, None] + EPSILON)
        feats = (feats * m).astype(np.float32)
        data = {"input_features": feats, "attention_mask": mask.astype(np.int64)}
        if return_tensors == "jax":
            data = {k: jnp.asarray(v) for k, v in data.items()}
        return BatchFeature(data)
