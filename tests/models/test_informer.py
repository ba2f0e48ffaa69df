"""Informer parity vs torch: full-attention config matches the reference
loss/params exactly; prob-sparse + distil configs run end to end (the
reference key-sampling is nondeterministic, so prob mode checks shapes)."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402

CFG = dict(prediction_length=4, context_length=6, lags_sequence=[1, 2, 3],
           num_time_features=2, encoder_layers=2, decoder_layers=2,
           d_model=16, encoder_attention_heads=2, decoder_attention_heads=2,
           encoder_ffn_dim=24, decoder_ffn_dim=24, num_parallel_samples=5,
           scaling="mean", sampling_factor=2)
PAST_LEN = 6 + 3


def make_batch():
    rng = np.random.RandomState(0)
    return dict(
        past_values=np.abs(rng.randn(2, PAST_LEN)).astype(np.float32) + 1.0,
        past_time_features=rng.randn(2, PAST_LEN, 2).astype(np.float32),
        past_observed_mask=np.ones((2, PAST_LEN), dtype=np.float32),
        future_values=np.abs(rng.randn(2, 4)).astype(np.float32) + 1.0,
        future_time_features=rng.randn(2, 4, 2).astype(np.float32),
    )


def make_tiny(tmp_dir, **over):
    import torch
    import transformers

    torch.manual_seed(0)
    config = transformers.InformerConfig(**{**CFG, **over},
                                         attn_implementation="eager")
    tm = transformers.InformerForPrediction(config).eval()
    tm.save_pretrained(tmp_dir, safe_serialization=True)
    return tm


def test_full_attention_parity(tmp_path):
    import torch

    d = str(tmp_path / "full")
    tm = make_tiny(d, attention_type="full", distil=False)
    model = ttpu.AutoModelForTimeSeriesPrediction.from_pretrained(d, dtype="float32")
    assert not model.load_report.missing_keys, model.load_report.missing_keys
    assert not model.load_report.unexpected_keys, model.load_report.unexpected_keys
    batch = make_batch()
    with torch.no_grad():
        ref = tm(**{k: torch.tensor(v) for k, v in batch.items()})
    out = model(model.params, **{k: jnp.asarray(v) for k, v in batch.items()})
    for p_ref, p_ours in zip(ref.params, out.params):
        assert max_abs_diff(p_ours, p_ref.numpy()) < 5e-4
    assert abs(float(out.loss) - float(ref.loss)) < 5e-4


def test_distil_conv_parity(tmp_path):
    import torch

    d = str(tmp_path / "distil")
    tm = make_tiny(d, attention_type="full", distil=True)
    model = ttpu.AutoModelForTimeSeriesPrediction.from_pretrained(d, dtype="float32")
    assert not model.load_report.missing_keys, model.load_report.missing_keys
    batch = make_batch()
    with torch.no_grad():
        ref = tm(**{k: torch.tensor(v) for k, v in batch.items()})
    out = model(model.params, **{k: jnp.asarray(v) for k, v in batch.items()})
    assert abs(float(out.loss) - float(ref.loss)) < 5e-4


def test_prob_sparse_runs(tmp_path):
    d = str(tmp_path / "prob")
    make_tiny(d, attention_type="prob", distil=True)
    model = ttpu.AutoModelForTimeSeriesPrediction.from_pretrained(d, dtype="float32")
    batch = make_batch()
    out = model(model.params, **{k: jnp.asarray(v) for k, v in batch.items()})
    assert np.isfinite(float(out.loss))
    batch.pop("future_values")
    gen = model.generate(model.params, **{k: jnp.asarray(v) for k, v in batch.items()})
    assert gen.sequences.shape == (2, 5, 4)
    assert np.isfinite(np.asarray(gen.sequences)).all()
