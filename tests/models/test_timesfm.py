"""TimesFM parity vs torch: patched normalization, softplus query scaling,
AR horizon decode, quantile heads."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402

CFG = dict(patch_length=8, context_length=64, horizon_length=16, freq_size=3,
           num_hidden_layers=2, hidden_size=32, intermediate_size=48,
           head_dim=8, num_attention_heads=4, quantiles=[0.1, 0.5, 0.9],
           use_positional_embedding=True)


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    import torch
    import transformers

    d = str(tmp_path_factory.mktemp("timesfm"))
    torch.manual_seed(0)
    tm = transformers.TimesFmModelForPrediction(
        transformers.TimesFmConfig(**CFG, attn_implementation="eager")).eval()
    tm.save_pretrained(d, safe_serialization=True)
    return d, tm


def test_prediction_parity(ckpt):
    import torch

    d, tm = ckpt
    m = ttpu.AutoModelForTimeSeriesPrediction.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    rng = np.random.default_rng(0)
    series = [rng.normal(size=64).astype(np.float32),
              rng.normal(size=40).astype(np.float32) + 3.0]
    with torch.no_grad():
        ref = tm(past_values=[torch.tensor(s) for s in series], freq=[0, 1])
    out = m(m.params, past_values=series, freq=[0, 1])
    assert max_abs_diff(out.mean_predictions,
                        ref.mean_predictions.numpy()) < 2e-4, \
        max_abs_diff(out.mean_predictions, ref.mean_predictions.numpy())
    assert max_abs_diff(out.full_predictions,
                        ref.full_predictions.numpy()) < 2e-4
