"""Moonshine Streaming ("moonshine_streaming"): streaming raw-wave encoder +
rotary decoder. Checks 4x time reduction, asymmetric-window causality
(zero right-lookahead layers must ignore future audio), and roundtrip."""

import sys
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from transformers_tpu.models.moonshine_streaming import (  # noqa: E402
    MoonshineStreamingConfig,
    MoonshineStreamingForConditionalGeneration,
)

TINY = dict(vocab_size=99, hidden_size=32, encoder_hidden_size=48,
            intermediate_size=64, encoder_num_hidden_layers=2,
            decoder_num_hidden_layers=2, encoder_num_attention_heads=4,
            decoder_num_attention_heads=4, max_position_embeddings=64,
            sliding_windows=[(4, 0), (4, 0)])


def test_forward_and_time_reduction():
    model = MoonshineStreamingForConditionalGeneration(MoonshineStreamingConfig(**TINY))
    params = model.init(jax.random.PRNGKey(0))
    wave = np.random.default_rng(0).normal(size=(1, 1600)).astype(np.float32)
    enc = model.encode(params, input_values=wave)
    # 1600 samples / 80-sample frames = 20 frames; two stride-2 convs -> 5
    assert enc.last_hidden_state.shape == (1, 5, 48)
    out = model(params, input_values=wave,
                decoder_input_ids=np.array([[1, 2, 3]]))
    assert out.logits.shape == (1, 3, 99)


def test_zero_lookahead_causality():
    """With right window 0, changing FUTURE audio must not change early
    encoder frames (streaming property)."""
    model = MoonshineStreamingForConditionalGeneration(MoonshineStreamingConfig(**TINY))
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    wave = rng.normal(size=(1, 1600)).astype(np.float32)
    wave2 = wave.copy()
    wave2[:, 1200:] = rng.normal(size=(1, 400))  # mutate the last 5 frames
    a = model.encode(params, input_values=wave).last_hidden_state
    b = model.encode(params, input_values=wave2).last_hidden_state
    # frame 0-1 depend only on the first ~2*4 frames of audio (conv receptive
    # field + left-only attention); frames from mutated region must differ
    np.testing.assert_allclose(np.asarray(a[:, :2]), np.asarray(b[:, :2]),
                               atol=1e-5)
    assert np.abs(np.asarray(a[:, -1]) - np.asarray(b[:, -1])).max() > 1e-4


def test_roundtrip(tmp_path):
    model = MoonshineStreamingForConditionalGeneration(MoonshineStreamingConfig(**TINY))
    model.params = model.init(jax.random.PRNGKey(2))
    d = str(tmp_path / "ms")
    model.save_pretrained(d)
    re = MoonshineStreamingForConditionalGeneration.from_pretrained(d, dtype="float32")
    assert not re.load_report.missing_keys, re.load_report.missing_keys
    wave = np.random.default_rng(3).normal(size=(1, 1600)).astype(np.float32)
    ids = np.array([[1, 2, 3]])
    a = model(model.params, input_values=wave, decoder_input_ids=ids).logits
    b = re(re.params, input_values=wave, decoder_input_ids=ids).logits
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
