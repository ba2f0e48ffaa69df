"""EnCodec feature extractor (reference
models/encodec/feature_extraction_encodec.py): raw (possibly stereo) audio
padded to the batch max -> ``input_values`` [B, C, T] + ``padding_mask``."""

from __future__ import annotations

import numpy as np

from ...feature_extraction_utils import BatchFeature, SequenceFeatureExtractor


class EncodecFeatureExtractor(SequenceFeatureExtractor):
    model_input_names = ["input_values", "padding_mask"]

    def __init__(self, feature_size=1, sampling_rate=24000, padding_value=0.0,
                 chunk_length_s=None, overlap=None, **kwargs):
        super().__init__(feature_size=feature_size, sampling_rate=sampling_rate,
                         padding_value=padding_value, **kwargs)
        self.chunk_length_s = chunk_length_s
        self.overlap = overlap

    def __call__(self, raw_audio, padding=True, max_length=None,
                 return_tensors="np", sampling_rate=None, **kwargs) -> BatchFeature:
        if sampling_rate is not None and sampling_rate != self.sampling_rate:
            raise ValueError(
                f"Model expects {self.sampling_rate} Hz input, got {sampling_rate}")
        if isinstance(raw_audio, np.ndarray) and raw_audio.ndim <= 2:
            raw_audio = [raw_audio]
        seqs = []
        for a in raw_audio:
            a = np.asarray(a, np.float32)
            if a.ndim == 1:
                a = a[None, :]  # [C=1, T]
            elif a.shape[0] > a.shape[-1]:
                a = a.T  # [T, C] -> [C, T]
            if a.shape[0] != self.feature_size:
                raise ValueError(
                    f"expected {self.feature_size} channels, got {a.shape[0]}")
            seqs.append(a)
        lengths = [a.shape[-1] for a in seqs]
        target = max_length or max(lengths)
        vals = np.zeros((len(seqs), self.feature_size, target), np.float32)
        mask = np.zeros((len(seqs), target), np.int64)
        for i, a in enumerate(seqs):
            n = min(a.shape[-1], target)
            vals[i, :, :n] = a[:, :n]
            mask[i, :n] = 1
        data = {"input_values": vals, "padding_mask": mask}
        if return_tensors == "jax":
            import jax.numpy as jnp

            data = {k: jnp.asarray(v) for k, v in data.items()}
        return BatchFeature(data)
