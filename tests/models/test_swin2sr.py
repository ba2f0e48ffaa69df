"""Swin2SR parity vs torch: RSTB stages + pixel-shuffle SR heads."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

from transformers_tpu.models.swin2sr import Swin2SRForImageSuperResolution  # noqa: E402

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")


def _cfg(upsampler, upscale=2, resi="1conv"):
    return transformers.Swin2SRConfig(
        image_size=16, patch_size=1, num_channels=3, embed_dim=16,
        depths=[2, 2], num_heads=[2, 2], window_size=4, mlp_ratio=2.0,
        upscale=upscale, upsampler=upsampler, resi_connection=resi)


@pytest.mark.parametrize("upsampler,upscale,resi", [
    ("pixelshuffle", 2, "1conv"),
    ("pixelshuffledirect", 2, "3conv"),
    ("nearest+conv", 4, "1conv"),
    ("", 1, "1conv"),  # denoise head
])
def test_swin2sr_parity(tmp_path, upsampler, upscale, resi):
    torch.manual_seed(0)
    cfg = _cfg(upsampler, upscale, resi)
    tm = transformers.Swin2SRForImageSuperResolution(cfg).eval()
    d = str(tmp_path / f"s2sr_{upsampler or 'denoise'}")
    tm.save_pretrained(d, safe_serialization=True)

    m = Swin2SRForImageSuperResolution.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys

    px = np.random.default_rng(0).random((1, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref = tm(pixel_values=torch.from_numpy(px)).reconstruction.numpy()
    out = m(m.params, pixel_values=jnp.asarray(px)).reconstruction
    assert out.shape == ref.shape
    assert max_abs_diff(out, ref) < 5e-5
