"""PatchTSMixer parity vs torch: scalers, mixer blocks, MSE forecast head."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402


@pytest.mark.parametrize("mode,scaling,pe", [
    ("common_channel", "std", False),
    ("mix_channel", "mean", True),
])
def test_prediction_parity(tmp_path, mode, scaling, pe):
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.PatchTSMixerConfig(
        context_length=32, patch_length=8, patch_stride=8, num_input_channels=3,
        d_model=16, num_layers=2, expansion_factor=2, dropout=0.0,
        head_dropout=0.0, mode=mode, scaling=scaling, prediction_length=8,
        use_positional_encoding=pe, positional_encoding_type="sincos")
    tm = transformers.PatchTSMixerForPrediction(cfg).eval()
    d = str(tmp_path / f"ptsm_{mode}")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModelForTimeSeriesPrediction.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    x = np.random.default_rng(0).normal(size=(2, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(past_values=torch.tensor(x)).prediction_outputs.numpy()
    out = m(m.params, past_values=x).prediction_outputs
    assert max_abs_diff(out, ref) < 2e-5, max_abs_diff(out, ref)
