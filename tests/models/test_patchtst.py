"""PatchTST time-series forecasting parity vs torch (point-forecast head)."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402

CASES = {
    "patchtst": dict(pooling_type="mean"),
    "patchtst-flat": dict(pooling_type=None),
    "patchtst-channelattn": dict(pooling_type="mean", channel_attention=True),
    "patchtst-postnorm": dict(pooling_type="mean", pre_norm=False),
}


@pytest.mark.parametrize("case", sorted(CASES))
def test_prediction_parity(case, tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.PatchTSTConfig(
        num_input_channels=3, context_length=32, patch_length=4, patch_stride=4,
        d_model=16, num_attention_heads=2, num_hidden_layers=2, ffn_dim=32,
        prediction_length=8, loss="mse", distribution_output=None, scaling="std",
        **CASES[case])
    tm = transformers.PatchTSTForPrediction(cfg).eval()
    d = str(tmp_path / case)
    tm.save_pretrained(d, safe_serialization=True)

    m = ttpu.AutoModelForTimeSeriesPrediction.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys

    rng = np.random.default_rng(0)
    past = rng.normal(size=(2, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(past_values=torch.tensor(past)).prediction_outputs.numpy()
    out = m(m.params, past_values=jnp.asarray(past)).prediction_outputs
    assert max_abs_diff(out, ref) < 1e-4, case
