"""Speech2Text feature extractor (reference
models/speech_to_text/feature_extraction_speech_to_text.py): kaldi log-mel
fbank (80 bins, povey 400/160, fft 512) + per-utterance cepstral mean/var
normalization over the live region."""

from __future__ import annotations

import numpy as np

from ...audio_utils import kaldi_fbank, mel_filter_bank, window_function
from ...feature_extraction_utils import BatchFeature, SequenceFeatureExtractor


class Speech2TextFeatureExtractor(SequenceFeatureExtractor):
    model_input_names = ["input_features", "attention_mask"]

    def __init__(self, feature_size=80, sampling_rate=16000, num_mel_bins=80,
                 padding_value=0.0, do_ceptral_normalize=True,
                 normalize_means=True, normalize_vars=True, **kwargs):
        super().__init__(feature_size=feature_size, sampling_rate=sampling_rate,
                         padding_value=padding_value, **kwargs)
        self.num_mel_bins = num_mel_bins
        self.do_ceptral_normalize = do_ceptral_normalize
        self.normalize_means = normalize_means
        self.normalize_vars = normalize_vars
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

    def utterance_cmvn(self, x: np.ndarray, input_length: int) -> np.ndarray:
        live = x[:input_length]
        if self.normalize_means:
            x = x - live.mean(axis=0)
            live = x[:input_length]
        if self.normalize_vars:
            x = x / np.maximum(live.std(axis=0), 1e-10)
        return x.astype(np.float32)

    def __call__(self, raw_speech, padding=True, max_length=None,
                 return_tensors="np", sampling_rate=None, **kwargs) -> BatchFeature:
        if sampling_rate is not None and sampling_rate != self.sampling_rate:
            raise ValueError(
                f"Model expects {self.sampling_rate} Hz input, got {sampling_rate}")
        if isinstance(raw_speech, np.ndarray) and raw_speech.ndim == 1:
            raw_speech = [raw_speech]
        feats = [self._extract_fbank_features(s) for s in raw_speech]
        lengths = [f.shape[0] for f in feats]
        target = max_length or max(lengths)
        out = np.zeros((len(feats), target, self.num_mel_bins), np.float32)
        mask = np.zeros((len(feats), target), np.int64)
        for i, f in enumerate(feats):
            n = min(f.shape[0], target)
            live = f[:n]
            if self.do_ceptral_normalize:
                # normalize the LIVE region only; pads stay padding_value
                # (reference normalizes pre-padding)
                live = self.utterance_cmvn(live, n)
            out[i, :n] = live
            out[i, n:] = self.padding_value
            mask[i, :n] = 1
        data = {"input_features": out, "attention_mask": mask}
        if return_tensors == "jax":
            import jax.numpy as jnp

            data = {k: jnp.asarray(v) for k, v in data.items()}
        return BatchFeature(data)
