"""SeamlessM4T feature extractor (reference
models/seamless_m4t/feature_extraction_seamless_m4t.py): kaldi fbank with
per-mel-bin zero-mean/unit-var normalization, then stride-2 frame stacking
to [n_frames//2, 160] with a matching downsampled attention mask. Also the
audio tier for Wav2Vec2-BERT."""

from __future__ import annotations

import numpy as np

from ...audio_utils import kaldi_fbank, mel_filter_bank, window_function
from ...feature_extraction_utils import BatchFeature, SequenceFeatureExtractor


class SeamlessM4TFeatureExtractor(SequenceFeatureExtractor):
    model_input_names = ["input_features", "attention_mask"]

    def __init__(self, feature_size=80, sampling_rate=16000, num_mel_bins=80,
                 padding_value=0.0, stride=2, **kwargs):
        super().__init__(feature_size=feature_size, sampling_rate=sampling_rate,
                         padding_value=padding_value, **kwargs)
        self.num_mel_bins = num_mel_bins
        self.stride = stride
        self.return_attention_mask = True
        self._mel_filters = mel_filter_bank(
            num_frequency_bins=257, num_mel_filters=num_mel_bins,
            min_frequency=20, max_frequency=sampling_rate // 2,
            sampling_rate=sampling_rate, norm=None, mel_scale="kaldi",
            triangularize_in_mel_space=True)
        self._window = window_function(400, "povey", periodic=False)

    def _extract_fbank_features(self, waveform: np.ndarray) -> np.ndarray:
        return kaldi_fbank(np.asarray(waveform, np.float32),
                           self._mel_filters, self._window)

    def __call__(self, raw_speech, padding=True, max_length=None,
                 do_normalize_per_mel_bins=True, return_tensors="np",
                 sampling_rate=None, **kwargs) -> BatchFeature:
        if sampling_rate is not None and sampling_rate != self.sampling_rate:
            raise ValueError(
                f"Model expects {self.sampling_rate} Hz input, got {sampling_rate}")
        if isinstance(raw_speech, np.ndarray) and raw_speech.ndim == 1:
            raw_speech = [raw_speech]
        feats = [self._extract_fbank_features(s) for s in raw_speech]
        if do_normalize_per_mel_bins:
            feats = [(f - f.mean(axis=0)) / np.sqrt(f.var(axis=0, ddof=1) + 1e-7)
                     for f in feats]
        lengths = [f.shape[0] for f in feats]
        target = max_length or max(lengths)
        target = (target // self.stride) * self.stride  # stackable length
        b = len(feats)
        padded = np.zeros((b, target, self.num_mel_bins), np.float32)
        mask = np.zeros((b, target), np.int64)
        for i, f in enumerate(feats):
            n = min(f.shape[0] // self.stride * self.stride, target)
            padded[i, :n] = f[:n]
            mask[i, :n] = 1
        stacked = padded.reshape(b, target // self.stride,
                                 self.num_mel_bins * self.stride)
        mask = mask[:, :: self.stride]
        data = {"input_features": stacked, "attention_mask": mask}
        if return_tensors == "jax":
            import jax.numpy as jnp

            data = {k: jnp.asarray(v) for k, v in data.items()}
        return BatchFeature(data)
