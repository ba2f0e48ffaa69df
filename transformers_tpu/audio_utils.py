"""Audio DSP library.

TPU-native analog of reference src/transformers/audio_utils.py
(``mel_filter_bank`` :638, ``window_function`` :745, ``spectrogram`` :809,
``spectrogram_batch`` :1020). Filter banks are built host-side in numpy
(computed once from static config); the spectrogram itself is pure jnp
(frame -> window -> rfft -> |.|^2 -> mel matmul) so STFT->log-mel runs ON
DEVICE and fuses with the encoder's first conv (the north-star
"preprocessing off host" requirement, SURVEY §7).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np


def hertz_to_mel(freq, mel_scale: str = "htk"):
    """reference audio_utils.py hertz_to_mel (htk + slaney variants)."""
    freq = np.asarray(freq, dtype=np.float64)
    if mel_scale == "htk":
        return 2595.0 * np.log10(1.0 + freq / 700.0)
    if mel_scale == "kaldi":
        return 1127.0 * np.log(1.0 + freq / 700.0)
    # slaney
    min_log_hertz = 1000.0
    min_log_mel = 15.0
    logstep = 27.0 / np.log(6.4)
    mels = 3.0 * freq / 200.0
    log_region = freq >= min_log_hertz
    mels = np.where(log_region, min_log_mel + np.log(np.maximum(freq, 1e-10) / min_log_hertz) * logstep, mels)
    return mels


def mel_to_hertz(mels, mel_scale: str = "htk"):
    mels = np.asarray(mels, dtype=np.float64)
    if mel_scale == "htk":
        return 700.0 * (10.0 ** (mels / 2595.0) - 1.0)
    if mel_scale == "kaldi":
        return 700.0 * (np.exp(mels / 1127.0) - 1.0)
    min_log_hertz = 1000.0
    min_log_mel = 15.0
    logstep = np.log(6.4) / 27.0
    freq = 200.0 * mels / 3.0
    log_region = mels >= min_log_mel
    freq = np.where(log_region, min_log_hertz * np.exp(logstep * (mels - min_log_mel)), freq)
    return freq


def mel_filter_bank(
    num_frequency_bins: int,
    num_mel_filters: int,
    min_frequency: float,
    max_frequency: float,
    sampling_rate: int,
    norm: Optional[str] = None,
    mel_scale: str = "htk",
    triangularize_in_mel_space: bool = False,
) -> np.ndarray:
    """Triangular mel filter bank [num_frequency_bins, num_mel_filters]
    (reference audio_utils.py:638; numerics match exactly)."""
    mel_min = hertz_to_mel(min_frequency, mel_scale)
    mel_max = hertz_to_mel(max_frequency, mel_scale)
    mel_freqs = np.linspace(mel_min, mel_max, num_mel_filters + 2)
    filter_freqs = mel_to_hertz(mel_freqs, mel_scale)

    if triangularize_in_mel_space:
        fft_bin_width = sampling_rate / ((num_frequency_bins - 1) * 2)
        fft_freqs = hertz_to_mel(fft_bin_width * np.arange(num_frequency_bins), mel_scale)
        filter_freqs = mel_freqs
    else:
        fft_freqs = np.linspace(0, sampling_rate // 2, num_frequency_bins)

    filter_diff = np.diff(filter_freqs)
    slopes = np.expand_dims(filter_freqs, 0) - np.expand_dims(fft_freqs, 1)
    down_slopes = -slopes[:, :-2] / filter_diff[:-1]
    up_slopes = slopes[:, 2:] / filter_diff[1:]
    mel_filters = np.maximum(np.zeros(1), np.minimum(down_slopes, up_slopes))

    if norm == "slaney":
        enorm = 2.0 / (filter_freqs[2 : num_mel_filters + 2] - filter_freqs[:num_mel_filters])
        mel_filters *= np.expand_dims(enorm, 0)
    return mel_filters.astype(np.float32)


def window_function(window_length: int, name: str = "hann", periodic: bool = True) -> np.ndarray:
    """reference audio_utils.py:745 (hann/hamming/povey/boxcar)."""
    length = window_length + 1 if periodic else window_length
    n = np.arange(length, dtype=np.float64)
    if name in ("hann", "hann_window"):
        window = 0.5 - 0.5 * np.cos(2 * np.pi * n / (length - 1))
    elif name == "hamming":
        window = 0.54 - 0.46 * np.cos(2 * np.pi * n / (length - 1))
    elif name == "povey":
        window = (0.5 - 0.5 * np.cos(2 * np.pi * n / (length - 1))) ** 0.85
    elif name == "boxcar":
        window = np.ones(length)
    else:
        raise ValueError(f"Unknown window {name!r}")
    if periodic:
        window = window[:-1]
    return window.astype(np.float32)


def kaldi_fbank(
    waveform: np.ndarray,  # [T] float in [-1, 1]
    mel_filters: np.ndarray,  # [n_freqs, n_mels] kaldi-scale triangles
    window: np.ndarray,  # [frame_length] (povey, non-periodic)
    *,
    frame_length: int = 400,
    hop_length: int = 160,
    fft_length: int = 512,
    preemphasis: float = 0.97,
    remove_dc_offset: bool = True,
    mel_floor: float = 1.192092955078125e-07,
) -> np.ndarray:
    """Kaldi-compliance log-mel fbank, numpy (reference audio_utils.py
    ``spectrogram`` with the Speech2Text parameterization — the
    torchaudio-free fallback path of
    models/speech_to_text/feature_extraction_speech_to_text.py:120-137):
    16-bit scaling, snip-edges framing (no centering), per-frame DC removal,
    per-frame preemphasis, povey window, |rfft|^2, kaldi-mel triangles,
    natural log with floor. Returns [n_frames, n_mels] float32."""
    wav = np.asarray(waveform, np.float64) * (2 ** 15)
    t = wav.shape[-1]
    n_frames = 1 + (t - frame_length) // hop_length if t >= frame_length else 0
    if n_frames <= 0:
        return np.zeros((0, mel_filters.shape[1]), np.float32)
    idx = (np.arange(n_frames)[:, None] * hop_length
           + np.arange(frame_length)[None, :])
    frames = wav[idx]
    if remove_dc_offset:
        frames = frames - frames.mean(-1, keepdims=True)
    if preemphasis:
        # first sample scales by (1 - coeff), the rest are x[i] - c*x[i-1]
        frames = np.concatenate(
            [frames[:, :1] * (1.0 - preemphasis),
             frames[:, 1:] - preemphasis * frames[:, :-1]], axis=1)
    frames = frames * np.asarray(window, np.float64)
    spec = np.fft.rfft(frames, n=fft_length, axis=-1)
    power = np.abs(spec) ** 2
    mel = np.maximum(power @ np.asarray(mel_filters, np.float64), mel_floor)
    return np.log(mel).astype(np.float32)


def chroma_filter_bank(
    num_frequency_bins: int,
    num_chroma: int,
    sampling_rate: int,
    tuning: float = 0.0,
    power: float = 2.0,
    weighting_parameters: tuple = (5.0, 2.0),
    start_at_c_chroma: bool = True,
) -> np.ndarray:
    """Chroma filter bank [num_frequency_bins, num_chroma] (reference
    audio_utils.py chroma_filter_bank == librosa.filters.chroma): wrap FFT
    bins onto 12 pitch classes with gaussian bin spread and octave
    weighting."""
    frequencies = np.linspace(0, sampling_rate, num_frequency_bins,
                              endpoint=False)[1:]
    freq_bins = num_chroma * (np.log2(frequencies / (440.0 / 16)) - tuning / num_chroma)
    freq_bins = np.concatenate(([freq_bins[0] - 1.5 * num_chroma], freq_bins))
    bins_width = np.concatenate((np.maximum(freq_bins[1:] - freq_bins[:-1], 1.0), [1]))
    chroma_filters = np.subtract.outer(freq_bins, np.arange(0, num_chroma, dtype="d")).T
    num_chroma2 = np.round(float(num_chroma) / 2)
    chroma_filters = np.remainder(chroma_filters + num_chroma2 + 10 * num_chroma,
                                  num_chroma) - num_chroma2
    chroma_filters = np.exp(-0.5 * (2 * chroma_filters / np.tile(bins_width, (num_chroma, 1))) ** 2)
    if power is not None:
        chroma_filters = chroma_filters / np.sum(
            chroma_filters ** power, axis=0, keepdims=True) ** (1.0 / power)
    if weighting_parameters:
        center, half_width = weighting_parameters
        chroma_filters *= np.tile(
            np.exp(-0.5 * (((freq_bins / num_chroma - center) / half_width) ** 2)),
            (num_chroma, 1))
    if start_at_c_chroma:
        chroma_filters = np.roll(chroma_filters, -3 * (num_chroma // 12), axis=0)
    # drop aliasing columns: [num_chroma, 1 + num_frequency_bins // 2]
    return np.ascontiguousarray(
        chroma_filters[:, : int(1 + num_frequency_bins / 2)])


def stft_magnitudes(
    waveform: jnp.ndarray,  # [..., T]
    *,
    n_fft: int,
    hop_length: int,
    window: np.ndarray,
    center: bool = True,
    power: float = 2.0,
    pad_mode: str = "reflect",
) -> jnp.ndarray:
    """|STFT|^power as pure jnp ops: pad -> frame -> window -> rfft.

    Matches torch.stft(center=True, pad_mode=...) numerics
    (reference models/whisper/feature_extraction_whisper.py:135-168).
    Returns [..., n_freqs, n_frames].
    """
    if center:
        pad = n_fft // 2
        pad_width = [(0, 0)] * (waveform.ndim - 1) + [(pad, pad)]
        waveform = jnp.pad(waveform, pad_width,
                           mode="constant" if pad_mode == "constant" else "reflect")
    t = waveform.shape[-1]
    n_frames = 1 + (t - n_fft) // hop_length
    idx = (jnp.arange(n_frames)[:, None] * hop_length + jnp.arange(n_fft)[None, :])
    frames = waveform[..., idx]  # [..., n_frames, n_fft]
    frames = frames * jnp.asarray(window, frames.dtype)
    spec = jnp.fft.rfft(frames.astype(jnp.float32), axis=-1)  # [..., n_frames, n_freqs]
    mag = jnp.abs(spec)
    if power == 2.0:
        mag = jnp.square(mag)
    elif power != 1.0:
        mag = mag**power
    return jnp.swapaxes(mag, -1, -2)  # [..., n_freqs, n_frames]
