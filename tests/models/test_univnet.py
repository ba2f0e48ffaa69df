"""UnivNet vocoder parity vs torch: kernel-predictor resnet + location
variable convolutions with gated activations."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")


def test_univnet_parity(tmp_path):
    from transformers_tpu.models.univnet import UnivNetModel

    torch.manual_seed(0)
    cfg = transformers.UnivNetConfig(
        model_in_channels=8, model_hidden_channels=4, num_mel_bins=10,
        resblock_kernel_sizes=[3, 3], resblock_stride_sizes=[4, 2],
        resblock_dilation_sizes=[[1, 3], [1, 3]],
        kernel_predictor_num_blocks=2, kernel_predictor_hidden_channels=8)
    tm = transformers.UnivNetModel(cfg).eval()
    d = str(tmp_path / "univnet")
    tm.save_pretrained(d, safe_serialization=True)

    m = UnivNetModel.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys

    rng = np.random.default_rng(0)
    t = 6
    feats = rng.standard_normal((1, t, 10)).astype(np.float32)
    noise = rng.standard_normal((1, t, 8)).astype(np.float32)
    with torch.no_grad():
        ref = tm(input_features=torch.from_numpy(feats),
                 noise_sequence=torch.from_numpy(noise)).waveforms.numpy()
    out = m(m.params, input_features=jnp.asarray(feats),
            noise_sequence=jnp.asarray(noise)).waveforms
    assert out.shape == ref.shape
    assert max_abs_diff(out, ref) < 1e-4
