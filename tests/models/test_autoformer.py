"""Autoformer parity vs torch: decomposition + auto-correlation attention,
NLL loss/params parity and single-shot sampling forecast."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402

CFG = dict(prediction_length=4, context_length=8, label_length=2,
           moving_average=3, autocorrelation_factor=2,
           lags_sequence=[1, 2, 3], num_time_features=2, encoder_layers=2,
           decoder_layers=2, d_model=16, encoder_attention_heads=2,
           decoder_attention_heads=2, encoder_ffn_dim=24, decoder_ffn_dim=24,
           num_parallel_samples=5, scaling="mean")
PAST_LEN = 8 + 3


def make_batch():
    rng = np.random.RandomState(0)
    return dict(
        past_values=np.abs(rng.randn(2, PAST_LEN)).astype(np.float32) + 1.0,
        past_time_features=rng.randn(2, PAST_LEN, 2).astype(np.float32),
        past_observed_mask=np.ones((2, PAST_LEN), dtype=np.float32),
        future_values=np.abs(rng.randn(2, 4)).astype(np.float32) + 1.0,
        future_time_features=rng.randn(2, 4, 2).astype(np.float32),
    )


def make_tiny(tmp_dir):
    import torch
    import transformers

    torch.manual_seed(0)
    config = transformers.AutoformerConfig(**CFG, attn_implementation="eager")
    tm = transformers.AutoformerForPrediction(config).eval()
    tm.save_pretrained(tmp_dir, safe_serialization=True)
    return tm


def test_loss_and_params_parity(tmp_path):
    import torch

    d = str(tmp_path / "af")
    tm = make_tiny(d)
    model = ttpu.AutoModelForTimeSeriesPrediction.from_pretrained(d, dtype="float32")
    assert not model.load_report.missing_keys, model.load_report.missing_keys
    assert not model.load_report.unexpected_keys, model.load_report.unexpected_keys
    batch = make_batch()
    with torch.no_grad():
        ref = tm(**{k: torch.tensor(v) for k, v in batch.items()})
    out = model(model.params, **{k: jnp.asarray(v) for k, v in batch.items()})
    for p_ref, p_ours in zip(ref.params, out.params):
        assert max_abs_diff(p_ours, p_ref.numpy()) < 5e-4
    assert abs(float(out.loss) - float(ref.loss)) < 5e-4, (out.loss, ref.loss)


def test_generate_shapes(tmp_path):
    d = str(tmp_path / "gen")
    make_tiny(d)
    model = ttpu.AutoModelForTimeSeriesPrediction.from_pretrained(d, dtype="float32")
    batch = make_batch()
    batch.pop("future_values")
    out = model.generate(model.params, **{k: jnp.asarray(v) for k, v in batch.items()})
    assert out.sequences.shape == (2, 5, 4)
    assert np.isfinite(np.asarray(out.sequences)).all()
