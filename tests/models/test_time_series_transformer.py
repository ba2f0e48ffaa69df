"""TimeSeriesTransformer parity vs torch: NLL loss + distribution params
on tiny random checkpoints (student_t and negative_binomial heads),
plus sampling-forecast shape."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402

CFG = dict(prediction_length=4, context_length=6, lags_sequence=[1, 2, 3],
           num_time_features=2, num_static_categorical_features=1,
           num_static_real_features=1, cardinality=[5],
           embedding_dimension=[3], encoder_layers=2, decoder_layers=2,
           d_model=16, encoder_attention_heads=2, decoder_attention_heads=2,
           encoder_ffn_dim=24, decoder_ffn_dim=24, num_parallel_samples=7,
           scaling="mean")
PAST_LEN = 6 + 3  # context + max lag


def make_batch():
    rng = np.random.RandomState(0)
    return dict(
        past_values=np.abs(rng.randn(2, PAST_LEN)).astype(np.float32) + 1.0,
        past_time_features=rng.randn(2, PAST_LEN, 2).astype(np.float32),
        past_observed_mask=np.ones((2, PAST_LEN), dtype=np.float32),
        static_categorical_features=np.array([[1], [3]], dtype=np.int64),
        static_real_features=rng.randn(2, 1).astype(np.float32),
        future_values=np.abs(rng.randn(2, 4)).astype(np.float32) + 1.0,
        future_time_features=rng.randn(2, 4, 2).astype(np.float32),
    )


def make_tiny(tmp_dir, distribution_output):
    import torch
    import transformers

    torch.manual_seed(0)
    config = transformers.TimeSeriesTransformerConfig(
        **CFG, distribution_output=distribution_output,
        attn_implementation="eager")
    tm = transformers.TimeSeriesTransformerForPrediction(config).eval()
    tm.save_pretrained(tmp_dir, safe_serialization=True)
    return tm


@pytest.mark.parametrize("head", ["student_t", "negative_binomial"])
def test_loss_and_params_parity(head, tmp_path):
    import torch

    d = str(tmp_path / head)
    tm = make_tiny(d, head)
    model = ttpu.AutoModelForTimeSeriesPrediction.from_pretrained(d, dtype="float32")
    assert not model.load_report.missing_keys, model.load_report.missing_keys
    assert not model.load_report.unexpected_keys, model.load_report.unexpected_keys

    batch = make_batch()
    if head == "negative_binomial":
        batch["past_values"] = np.round(batch["past_values"] * 3)
        batch["future_values"] = np.round(batch["future_values"] * 3)
    tb = {k: torch.tensor(v) for k, v in batch.items()}
    with torch.no_grad():
        ref = tm(**tb)
    out = model(model.params, **{k: jnp.asarray(v) for k, v in batch.items()})
    ours = list(out.params)
    if head == "negative_binomial":
        # the reference mutates the returned logits in place when building the
        # scaled distribution (`logits += scale.log()`); replicate for compare
        ours[1] = ours[1] + np.log(np.asarray(out.scale))[:, 0:1]
    for p_ref, p_ours in zip(ref.params, ours):
        assert max_abs_diff(p_ours, p_ref.numpy()) < 5e-4
    assert abs(float(out.loss) - float(ref.loss)) < 5e-4, (out.loss, ref.loss)


def test_generate_shapes(tmp_path):
    d = str(tmp_path / "gen")
    make_tiny(d, "student_t")
    model = ttpu.AutoModelForTimeSeriesPrediction.from_pretrained(d, dtype="float32")
    batch = make_batch()
    batch.pop("future_values")
    out = model.generate(model.params, **{k: jnp.asarray(v) for k, v in batch.items()})
    assert out.sequences.shape == (2, 7, 4)
    assert np.isfinite(np.asarray(out.sequences)).all()
